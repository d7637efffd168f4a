"""SCD Type-2 merge semantics: close-and-version on change, no-op on
identical replay, plain insert on new keys, history never touched."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.operators.scd import scd2_apply


def _rows(df):
    return {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_apply_semantics(spark):
    dim = spark.createDataFrame(
        [
            (1, "A", "2020-01-01", None, True),
            (1, "OLD", "2019-01-01", "2020-01-01", False),  # history row
            (2, "B", "2020-01-01", None, True),
        ],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (3, "C")], "k long, attr string"
    )
    out = scd2_apply(dim, updates, ["k"], ["attr"], F.lit("2024-06-01"))
    assert _rows(out) == {
        (1, "OLD", "2019-01-01", "2020-01-01", False),  # history untouched
        (1, "A", "2020-01-01", "2024-06-01", False),    # closed
        (1, "A2", "2024-06-01", None, True),            # new version
        (2, "B", "2020-01-01", None, True),             # identical → no-op
        (3, "C", "2024-06-01", None, True),             # new key insert
    }

    # replaying the same batch later must change nothing (idempotence)
    out2 = scd2_apply(out, updates, ["k"], ["attr"], F.lit("2024-07-01"))
    assert _rows(out2) == _rows(out)

    # every key has exactly one current row
    cur = out2.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)

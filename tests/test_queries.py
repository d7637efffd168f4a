"""Smoke + shape tests for every registered query at sf0.001.

The value-level gate is the DuckDB oracle (tools/check_oracle.py and the
driver's CORRECTNESS run); here we assert each query executes, returns a
stable schema, and satisfies cheap invariants.
"""

from __future__ import annotations

import pytest

from spotify_tracks_etl_portfolio_spark.plans import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None


def test_flagship_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


def test_winsorized_null_robust(spark, tmp_path):
    """winsorized_event_values must agree with its DuckDB oracle even
    when events.value contains NULLs (ADVICE r2: Spark's non-nullable
    greatest(value, lit) would otherwise clamp NULLs to p01 and count
    them in the mean while the oracle drops them)."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(100), "h"),
            "user_id": [i % 7 for i in range(100)],
            "event_type": ["click"] * 100,
            "value": [float(i) if i % 5 else None for i in range(100)],
            "props": ["{}"] * 100,
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = tmp_path / "sfnull"
    sf.mkdir()
    pdf.to_parquet(sf / "events.parquet")

    spec = SPECS["winsorized_event_values"]
    got = spec.fn(spark, str(sf)).first().asDict()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    cols = [d[0] for d in con.execute(spec.oracle).description]
    want = dict(zip(cols, con.execute(spec.oracle).fetchone()))
    assert got == pytest.approx(want), (got, want)


def test_queries_pin_utc_on_foreign_timezone_session(spark, sf_dir):
    """The driver hands queries a session IT built (no factory confs).
    On a non-UTC host every date_format/window string would shift
    against the UTC-naive DuckDB oracle — so the reader layer must pin
    the session timezone itself, same as nanosAsLong."""
    import duckdb

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = SPECS["hourly_event_rollup"].fn(spark, sf_dir)
        # constructing the query re-pinned the session to UTC
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = df.orderBy("hour").first()["hour"]
        want = duckdb.sql(
            "SELECT strftime(date_trunc('hour', min(ts)), '%Y-%m-%d %H:%M:%S') "
            f"FROM '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")

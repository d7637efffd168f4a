"""Registry-wide oracle dtype lint.

The round-3 driver hash failures (`embedding_random_projection`,
`embedding_diverse_sample`) were caused by DuckDB's ``sum(BIGINT)``
returning HUGEINT, which crosses the driver's Arrow fetch as
decimal128 and hash-mismatches Spark's int64 even for identical values.
This lint DESCRIBEs every registered oracle and rejects any output
column whose DuckDB type is HUGEINT/UHUGEINT — i.e. any integer
aggregate missing an explicit ``CAST(... AS BIGINT)`` in the SELECT
list — so the class of defect cannot recur.  (The deeper gate is
``tools/check_oracle.py``, which now fetches through Arrow with
type-strict comparison; this test is the fast CI tripwire.)
"""

from __future__ import annotations

import os

import duckdb

from spotify_tracks_etl_portfolio_spark.plans import all_queries
from spotify_tracks_etl_portfolio_spark.schemas import TESTDATA_TABLES


def test_utf8_bytes_sql_is_exact_for_non_ascii():
    """The multimodal oracles' byte geometry must equal Python's
    ``str.encode('utf-8')`` for ANY input, not just ASCII (round-3
    advice: ascii(c) per character silently diverges on non-ASCII)."""
    from spotify_tracks_etl_portfolio_spark.plans.extensions import (
        _utf8_bytes_sql,
    )

    samples = [
        "plain ascii",
        "café naïve",  # 2-byte sequences
        "€100 中文",  # 3-byte sequences
        "emoji \U0001f600\U0001f680",  # 4-byte sequences
        "",
    ]
    con = duckdb.connect()
    expr = _utf8_bytes_sql("t")
    for s in samples:
        got = con.execute(
            f"SELECT {expr} AS b, octet_length(encode(t)) AS n "
            "FROM (SELECT ? AS t)",
            [s],
        ).fetchone()
        want = list(s.encode("utf-8"))
        assert list(got[0] or []) == want, s
        assert got[1] == len(want), s


def test_no_oracle_emits_hugeint(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )
    offenders: dict[str, object] = {}
    for name, spec in sorted(all_queries().items()):
        if spec.oracle is None:
            continue
        try:
            desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        except Exception as e:  # an oracle DuckDB can't even plan is a bug
            offenders[name] = f"DESCRIBE failed: {e}"
            continue
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if typ in ("HUGEINT", "UHUGEINT")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting HUGEINT output columns (uncast integer "
        f"aggregates — cast to BIGINT): {offenders}"
    )

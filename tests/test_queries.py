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

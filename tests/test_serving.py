"""SQL serving endpoint (S10 deployment shape): an external JDBC client
connects to the engine over the HiveServer2 Thrift protocol and runs
dashboard queries — closing the reference's Metabase→MySQL gap
(reference: README.md:69-75)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.serving import (
    jdbc_query,
    publish_tables,
    start_sql_endpoint,
)


@pytest.fixture(scope="module")
def endpoint(spark, sf_dir):
    port = start_sql_endpoint(spark)
    publish_tables(spark, sf_dir, ["events", "customer"])
    return port


def test_external_jdbc_client_runs_dashboard_query(spark, sf_dir, endpoint):
    """The events_overview dashboard tile computed by an external SQL
    client over the wire must match the engine's own DataFrame path."""
    rows = jdbc_query(
        spark,
        "SELECT count(*) AS total_events, "
        "count(DISTINCT user_id) AS unique_users "
        "FROM global_temp.events",
        endpoint,
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("u"),
        ).first()
    )
    assert rows == [(want["n"], want["u"])]


def test_jdbc_client_sees_group_by_results(spark, endpoint):
    via_jdbc = jdbc_query(
        spark,
        "SELECT event_type, count(*) AS n FROM global_temp.events "
        "GROUP BY event_type ORDER BY event_type",
        endpoint,
    )
    via_df = [
        (r["event_type"], r["n"])
        for r in spark.table("global_temp.events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
        .collect()
    ]
    assert via_jdbc == via_df

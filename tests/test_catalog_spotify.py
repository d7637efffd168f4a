"""Catalog DDL ops (S5/S6/S8/S9) and the drop-in spotify pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from spotify_tracks_etl_portfolio_spark.sources import catalog
from spotify_tracks_etl_portfolio_spark.spotify import (
    run_spotify_bronze,
    run_spotify_silver,
)
from tests.test_pipeline import CSV_HEADER, CSV_ROWS


def test_create_table_idempotent_and_like(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
        ]
    )
    catalog.create_table_idempotent(spark, "t_src", schema)
    catalog.create_table_idempotent(spark, "t_src", schema)  # no error: IF NOT EXISTS
    catalog.create_table_like(spark, "t_dst", "t_src")
    assert spark.table("t_dst").schema == spark.table("t_src").schema

    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    catalog.insert_into(df, "t_src")
    catalog.insert_into(df, "t_dst")
    catalog.insert_into(df, "t_dst", overwrite=True)
    assert catalog.table_row_count(spark, "t_src") == 2
    assert catalog.table_row_count(spark, "t_dst") == 2
    spark.sql("DROP TABLE t_src")
    spark.sql("DROP TABLE t_dst")


@pytest.fixture(scope="module")
def spotify_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("spotify")
    csv = root / "dataset.csv"
    csv.write_text(CSV_HEADER + "\n" + "\n".join(CSV_ROWS) + "\n")
    return str(csv), str(root / "bronze"), str(root / "silver")


def test_spotify_drop_in_pipeline(spark, spotify_paths):
    csv, bronze, silver = spotify_paths
    report = run_spotify_bronze(
        spark, csv, bronze,
        load_type="full", batch_identifier="batch_20240101_000000",
    )
    assert report.rows_loaded == 5
    # bronze gate is SOFT: artists null + compound dup exist, load happened
    assert not report.dq["success"]

    result = run_spotify_silver(spark, bronze, silver)
    assert result["rows_silver"] == 4
    out = spark.read.parquet(silver)
    assert out.filter("track_id IS NULL").count() == 0
    # every silver expectation holds after impute/clamp/dedup
    assert result["dq"]["success"]
    # partition-by-batch survived to bronze layout (the index analogue)
    assert spark.read.parquet(bronze).select("batch_identifier").distinct().count() == 1


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join WITHOUT any Exchange —
    the co-location contract write_bucketed exists for."""
    import re

    from pyspark.sql import functions as F

    from spotify_tracks_etl_portfolio_spark.sources.writers import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        write_bucketed(orders, "orders_bkt", ["o_orderkey"], 8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_bkt",
            ["o_orderkey"],
            8,
        )
        joined = spark.table("orders_bkt").join(
            spark.table("lineitem_bkt"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", plan)
        # and it computes the right thing
        n = joined.count()
        expected = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")

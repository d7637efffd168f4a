"""Scale-posture proofs: the runtime behaviors the engine relies on at
100 TB, demonstrated on synthetic data with thresholds scaled down —
AQE skew-join splitting and shuffle-partition coalescing actually
engage under this engine's session configuration."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    """A hot key 100× larger than the advisory partition size gets
    split by AQE's skew-join rule (skew=true in the FINAL adaptive
    plan) — the no-manual-salting path for skewed equi-joins."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hot = spark.range(200_000).select(
            F.lit(7).alias("k"), F.col("id").alias("payload")
        )
        cold = spark.range(20_000).select(
            (F.col("id") % 100 + 100).alias("k"), F.col("id").alias("payload")
        )
        right = spark.range(200).select(
            (F.col("id") % 200).alias("k"), (F.col("id") * 2).alias("rv")
        )
        j = hot.union(cold).join(right, "k")
        assert len(j.collect()) == 220_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """A tiny aggregation shuffled over 32 static partitions is read
    back as far fewer coalesced partitions — the mechanism that lets a
    statically over-partitioned plan right-size itself at runtime."""
    df = (
        spark.range(1_000)
        .select((F.col("id") % 7).alias("k"))
        .groupBy("k")
        .count()
    )
    # collect() drives THIS DataFrame's QueryExecution to its final
    # adaptive plan (count() would spawn a separate execution)
    assert len(df.collect()) == 7
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "coalesced" in plan

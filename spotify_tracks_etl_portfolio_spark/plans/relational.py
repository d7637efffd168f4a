"""Relational query surface: aggregation pipelines, joins, set ops,
window functions, rollups (SURVEY.md §2.3/§2.4/§2.5/§2.7).

The reference has no joins (single fact table, README.md:28), but the
engine's query surface must carry them (SURVEY.md §2.3): they're thin
declarative wrappers where Catalyst/AQE pick broadcast vs sort-merge.
Small dimensions (region/nation/customer/supplier at dimension scale)
are explicitly ``F.broadcast``-hinted on the build side; the fact-side
scan keeps filter pushdown.

Determinism for the DuckDB oracle: money sums go through DECIMAL(24,8)
(order-insensitive exact accumulation) and are cast to DOUBLE only at
the output; every LIMIT carries a total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.plans import register
from spotify_tracks_etl_portfolio_spark.sources.readers import read_parquet_table

# Per-row arithmetic stays in DOUBLE (bit-identical across engines for the
# same operands); the decimal cast happens on the per-row RESULT so the
# subsequent sum is exact and order-insensitive.
_DEC = "decimal(24,8)"


def _revenue(l) -> F.Column:
    return (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(_DEC)


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,8))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,8))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE) / count(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,8))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(24,8))) AS DOUBLE) / count(l_discount) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1 pricing summary: filter pushdown + 8-agg hash "
    "aggregation with map-side partials (SURVEY.md §2.4)",
    tags=("relational", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
        F.sum(disc_price.cast(_DEC)).cast("double").alias("sum_disc_price"),
        F.sum(charge.cast(_DEC)).cast("double").alias("sum_charge"),
        (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count("l_quantity")).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.count("l_extendedprice")).alias("avg_price"),
        (F.sum(F.col("l_discount").cast(_DEC)).cast("double") / F.count("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "top10_customers_by_revenue",
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
""",
    description="3-way fact-dim join + top-k (TakeOrderedAndProject "
    "top-k). customer carries NO broadcast hint — it scales with SF "
    "(~1.7B rows at 100 TB); size-based planning broadcasts it at "
    "small SF and sort-merge-joins at large",
    tags=("relational", "join", "topn"),
)
def top10_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    l = read_parquet_table(spark, sf_dir, "lineitem")
    # Pre-aggregate lineitem to ONE row per order BEFORE the joins:
    # the join input shrinks ~6:1, and because each order then appears
    # exactly once per customer, the expensive countDistinct(o_orderkey)
    # (a second expand/shuffle pass) becomes a plain count. Measured
    # 1.65s -> 1.07s at sf0.1, bit-identical results (decimal partials
    # re-associate exactly).
    per_order = l.groupBy("l_orderkey").agg(F.sum(_revenue(l)).alias("__odec"))
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum("__odec").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "regional_revenue",
    oracle="""
SELECT r.r_name AS region,
       n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    description="TPC-H Q5-style snowflake join: fact → dims. Hard "
    "broadcast hints only on the fixed-cardinality dims (nation=25, "
    "region=5 rows at ANY scale); customer is size-gated by the "
    "planner — broadcast at small SF, shuffle join at 100 TB",
    tags=("relational", "join"),
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    o = read_parquet_table(spark, sf_dir, "orders")
    c = read_parquet_table(spark, sf_dir, "customer")
    n = read_parquet_table(spark, sf_dir, "nation")
    r = read_parquet_table(spark, sf_dir, "region")
    # Pre-aggregate lineitem to one row per order before the snowflake:
    # every group key lives on the customer side, so the fact table can
    # collapse ~6:1 ahead of the joins (revenue partials + lineitem
    # counts re-aggregate exactly).
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(_revenue(l)).alias("__odec"),
        F.count(F.lit(1)).alias("__nli"),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum("__odec").cast("double").alias("revenue"),
            F.sum("__nli").alias("n_lineitems"),
        )
    )


@register(
    "bucketed_orders_lineitem_revenue",
    oracle="""
SELECT o.o_orderstatus,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""",
    description="Co-located fact-fact join via PERSISTED BUCKETING — "
    "the shuffle-elimination primitive for 100 TB fact joins: orders "
    "and lineitem are written as bucketed tables (hash on the order "
    "key, same bucket count, one sorted file per bucket), so the join "
    "plans with NO exchange on either side — the one-time write "
    "shuffle is amortized over every later join/agg on the key. The "
    "residual per-bucket Sort is narrow (no data movement; Spark 3+ "
    "only propagates bucket sort order under the legacy "
    "bucketedTableScan.outputOrdering conf). Plan-gated: "
    "tests/test_plan_shapes.py::test_bucketed_join_has_no_shuffle",
    tags=("relational", "join", "bucketing"),
)
def bucketed_orders_lineitem_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from spotify_tracks_etl_portfolio_spark.plans.extensions import (
        _session_scratch,
    )
    from spotify_tracks_etl_portfolio_spark.sources.catalog import (
        create_bucketed_table,
    )

    d = _session_scratch(spark, "bucketed")
    create_bucketed_table(
        spark, "b_orders",
        read_parquet_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        ),
        "o_orderkey", 8, os.path.join(d, "b_orders"),
    )
    create_bucketed_table(
        spark, "b_lineitem",
        read_parquet_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "l_orderkey", 8, os.path.join(d, "b_lineitem"),
    )
    o = spark.table("b_orders")
    l = spark.table("b_lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(_revenue(l)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
""",
    description="Anti join (NOT EXISTS) — left_anti, broadcast-able build side",
    tags=("relational", "join"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "parts_in_open_orders_semi",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_parts
FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_partkey = p.p_partkey AND o.o_orderstatus = 'O'
)
""",
    description="Semi join (EXISTS) through a fact-side filter",
    tags=("relational", "join"),
)
def parts_in_open_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_parquet_table(spark, sf_dir, "part")
    l = read_parquet_table(spark, sf_dir, "lineitem")
    o = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    open_parts = l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
    return (
        p.join(open_parts, p.p_partkey == open_parts.l_partkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "order_status_rollup",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,8))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
    description="ROLLUP grouping-sets aggregation (subtotals + grand total); "
    "not in the reference, part of the general SQL surface (SURVEY.md §2.4)",
    tags=("relational", "rollup"),
)
def order_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total_price"),
    )


@register(
    "user_custkey_setops",
    oracle="""
SELECT
  (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events
                         UNION SELECT DISTINCT c_custkey FROM customer)) AS n_union,
  (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events
                         INTERSECT SELECT DISTINCT c_custkey FROM customer)) AS n_intersect,
  (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events
                         EXCEPT SELECT DISTINCT c_custkey FROM customer)) AS n_except
""",
    description="Set operations: UNION / INTERSECT / EXCEPT (SURVEY.md §2.7)",
    tags=("relational", "setops"),
)
def user_custkey_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = (
        read_parquet_table(spark, sf_dir, "events").select("user_id").distinct()
    )
    custs = (
        read_parquet_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"))
        .distinct()
    )
    n_union = users.union(custs).distinct().count()
    n_intersect = users.intersect(custs).count()
    n_except = users.exceptAll(custs).count()
    return spark.createDataFrame(
        [(n_union, n_intersect, n_except)],
        "n_union bigint, n_intersect bigint, n_except bigint",
    )


@register(
    "user_session_windows",
    oracle="""
SELECT event_id,
       user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       CAST(SUM(CAST(value AS DECIMAL(24,8))) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    description="Analytic window suite per user: row_number, lag, lead, "
    "running sum with an explicit frame (SURVEY.md §2.5 extensions)",
    tags=("relational", "window"),
)
def user_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_parquet_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast(_DEC)).over(frame).cast("double").alias(
            "running_value"
        ),
    )


# ---------------------------------------------------------------------------
# Temporal joins (operators/joins.py) — as-of + banded interval. The
# reference has no joins at all (README.md:28); these extend the surface
# for event/time-series workloads. DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------

from spotify_tracks_etl_portfolio_spark.operators.joins import (  # noqa: E402
    asof_join,
    interval_pairs_within,
)


@register(
    "asof_click_purchase",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id AS click_id,
       c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       p.event_id AS purchase_id,
       epoch_us(p.ts) AS purchase_ts_us,
       p.value AS purchase_value
FROM clicks c ASOF JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
    description="Backward as-of join: each click matched to the user's "
    "latest purchase at-or-before it. Implemented as a union-merge (one "
    "shuffle on user_id + running last() window), never an inequality "
    "join — the only shape that is linear at 100 TB",
    tags=("relational", "join", "asof"),
)
def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", right_prefix="p_"
    )
    return joined.select(
        "click_id",
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        F.col("p_event_id").alias("purchase_id"),
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.col("p_value").alias("purchase_value"),
    )


@register(
    "orders_within_30d_pairs",
    oracle="""
SELECT a.o_custkey,
       a.o_orderkey AS id_a,
       b.o_orderkey AS id_b,
       CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT) AS gap_days
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND (b.o_orderdate > a.o_orderdate
      OR (b.o_orderdate = a.o_orderdate AND b.o_orderkey > a.o_orderkey))
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
""",
    description="Banded interval self-join: ordered pairs of same-customer "
    "orders ≤30 days apart. The custkey equi-key keeps it a hash join with "
    "a post-match range predicate (bucketize-by-gap-width when no equi-key "
    "exists)",
    tags=("relational", "join", "interval"),
)
def orders_within_30d_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    pairs = interval_pairs_within(
        orders,
        ["o_custkey"],
        "o_orderdate",
        "o_orderkey",
        F.expr("INTERVAL 30 DAYS"),
    )
    return pairs.select(
        "o_custkey",
        "id_a",
        "id_b",
        F.datediff("ts_b", "ts_a").cast("long").alias("gap_days"),
    )


@register(
    "order_priority_cube",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS grouping_id,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,8))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    description="CUBE aggregation over (status, priority): all 4 grouping "
    "sets in one pass with an explicit grouping_id to disambiguate rolled-up "
    "NULLs (Spark grouping_id bit order matches DuckDB GROUPING()*2+GROUPING())",
    tags=("relational", "rollup"),
)
def order_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_parquet_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("long").alias("grouping_id"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total_price"),
    )


@register(
    "lineitem_quantity_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS p25,
       round(quantile_cont(l_quantity, 0.50), 6) AS p50,
       round(quantile_cont(l_quantity, 0.75), 6) AS p75,
       round(quantile_cont(l_quantity, 0.99), 6) AS p99
FROM lineitem
GROUP BY l_returnflag
""",
    description="Exact interpolated percentiles per group (SURVEY.md §2.4 "
    "A3 family). Exact percentile buffers all values per group — "
    "percentile_approx(col, p, accuracy) is the documented 100 TB knob "
    "(bounded-memory KLL-style sketch, mergeable map-side)",
    tags=("relational", "stats"),
)
def lineitem_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_quantity", p), 6).alias(name)
            for name, p in [
                ("p25", 0.25),
                ("p50", 0.50),
                ("p75", 0.75),
                ("p99", 0.99),
            ]
        ]
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    description="TPC-H Q6 forecasting-revenue-change: pure filter+agg with "
    "every predicate pushed to the parquet scan (shipdate min/max row-group "
    "skipping, discount/quantity as PushedFilters) — zero shuffle beyond "
    "the single-row final agg",
    tags=("relational", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    filtered = l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "top3_customers_per_nation",
    oracle="""
WITH rev AS (
  SELECT c.c_nationkey, c.c_custkey, c.c_name,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(24,8))) AS DOUBLE) AS revenue
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, c.c_custkey, c.c_name
),
ranked AS (
  SELECT n.n_name AS nation, rev.c_custkey, rev.c_name, rev.revenue,
         CAST(row_number() OVER (PARTITION BY rev.c_nationkey
              ORDER BY rev.revenue DESC, rev.c_custkey) AS BIGINT) AS rnk
  FROM rev JOIN nation n ON rev.c_nationkey = n.n_nationkey
)
SELECT nation, c_custkey, c_name, revenue, rnk
FROM ranked WHERE rnk <= 3
""",
    description="Per-group top-N: rank within each nation, keep top 3. One "
    "shuffle on the group key, per-partition sort only (no global sort) — "
    "the window partition key distributes, so this scales to any number of "
    "groups; the rank<=3 filter prunes before any downstream exchange",
    tags=("relational", "window", "topn"),
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    n = read_parquet_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"))
    )
    from spotify_tracks_etl_portfolio_spark.operators.similarity import (
        per_group_topk,
    )

    # two-stage bucketed rank: 25 nations over a customer-scaled
    # aggregate would otherwise merge each nation's survivors in one
    # task (per_group_topk docstring)
    ranked = per_group_topk(
        rev, "c_nationkey", "revenue", "c_custkey", 3, "rnk"
    ).withColumn("rnk", F.col("rnk").cast("long"))
    return (
        ranked.join(F.broadcast(n), ranked.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"), "c_custkey", "c_name", "revenue", "rnk"
        )
    )


@register(
    "cumulative_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
         SUM(CAST(o_totalprice AS DECIMAL(24,8))) AS dec_rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(dec_rev AS DOUBLE) AS day_revenue,
       n_orders,
       CAST(SUM(dec_rev) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cumulative_revenue
FROM daily
""",
    description="Running cumulative sum over pre-aggregated daily totals. "
    "Aggregate-then-window: the unpartitioned ordered window runs over "
    "~2.4k daily rows (one per day), not the raw fact table — the only "
    "safe way to use a global window at 100 TB. Running sums stay DECIMAL "
    "until output so the cumulative total is order-exact",
    tags=("relational", "window"),
)
def cumulative_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("dec_rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        F.col("dec_rev").cast("double").alias("day_revenue"),
        "n_orders",
        F.sum("dec_rev").over(w).cast("double").alias("cumulative_revenue"),
    )


@register(
    "small_quantity_parts_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE) / count(*) AS aq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(24,8))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN avg_qty a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < 0.5 * a.aq
""",
    description="TPC-H Q17 shape: correlated scalar subquery (per-part avg "
    "quantity) decorrelated into a self-join against a pre-aggregated "
    "side. Both sides shuffle on l_partkey once; AQE converts the "
    "aggregated side to broadcast when it fits. Per-part averages use "
    "DECIMAL sums so the 0.5*avg comparison is order-deterministic",
    tags=("relational", "tpch", "join"),
)
def small_quantity_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count(F.lit(1)))
        .alias("aq")
    )
    return (
        l.join(avg_qty, l.l_partkey == avg_qty.ak)
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "customer_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust GROUP BY n_orders
""",
    description="TPC-H Q13 shape: distribution of order counts per "
    "customer INCLUDING zero-order customers — the left outer join is "
    "load-bearing (an inner join silently drops the n_orders=0 bucket; "
    "count(o_orderkey) not count(*) makes the null-match rows count as "
    "0). Two hash aggregations; at 100 TB the first groupBy rides the "
    "join's existing c_custkey partitioning — no extra shuffle",
    tags=("relational", "tpch", "join"),
)
def customer_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "significant_parts_by_revenue",
    oracle="""
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8)))
           AS dec_rev
  FROM lineitem GROUP BY l_partkey
),
total AS (SELECT SUM(dec_rev) AS t, CAST(count(*) AS BIGINT) AS n FROM per_part)
SELECT p.l_partkey,
       CAST(p.dec_rev AS DOUBLE) AS revenue,
       round(CAST(p.dec_rev AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         AS revenue_share
FROM per_part p CROSS JOIN total t
WHERE CAST(p.dec_rev AS DOUBLE) / CAST(t.t AS DOUBLE) > 1.5 / t.n
""",
    description="TPC-H Q11 shape: keep groups whose aggregate exceeds a "
    "fraction of the GLOBAL aggregate (here 1.5× the uniform share, so "
    "the predicate is scale-invariant) — the global-threshold scalar "
    "subquery decorrelated into a broadcast of a 1-row total (never a "
    "window over the whole table). Both aggregates stay DECIMAL-exact; "
    "the share division happens once per group in DOUBLE, so the "
    "threshold comparison is order-deterministic",
    tags=("relational", "tpch"),
)
def significant_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(_revenue(l)).alias("dec_rev")
    )
    total = per_part.agg(
        F.sum("dec_rev").alias("t"), F.count(F.lit(1)).alias("n")
    )
    share = F.col("dec_rev").cast("double") / F.col("t").cast("double")
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(share > F.lit(1.5) / F.col("n"))
        .select(
            "l_partkey",
            F.col("dec_rev").cast("double").alias("revenue"),
            F.round(share, 6).alias("revenue_share"),
        )
    )


@register(
    "daily_revenue_gapfill",
    oracle="""
WITH bounds AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
         CAST(max(o_orderdate) AS DATE) AS d1
  FROM orders
),
cal AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(24,8))) AS dec_rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT strftime(c.d, '%Y-%m-%d') AS day,
       CAST(COALESCE(dd.dec_rev, 0) AS DOUBLE) AS revenue,
       COALESCE(dd.n_orders, 0) AS n_orders
FROM cal c LEFT JOIN daily dd ON c.d = dd.d
""",
    description="Calendar gap-fill: generate the full min..max day "
    "sequence (explode(sequence(...)) off a 1-row bounds aggregate) and "
    "left-join the daily rollup so empty days appear as explicit zeros "
    "— the time-series densification every downstream window/forecast "
    "needs. The calendar side is thousands of rows built from ONE "
    "aggregate, never a driver-side loop; the daily rollup is one hash "
    "aggregation of the fact table",
    tags=("relational", "timeseries"),
)
def daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("dec_rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    cal = bounds.select(F.explode(F.sequence("d0", "d1")).alias("d"))
    return (
        cal.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("dec_rev").cast("double"), F.lit(0.0)).alias(
                "revenue"
            ),
            F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        )
    )


@register(
    "customer_scd2_segment_update",
    oracle="""
SELECT c_custkey, c_mktsegment,
       '2020-01-01' AS valid_from,
       '2024-01-01' AS valid_to,
       false AS is_current
FROM customer WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'UPDATED'
UNION ALL
SELECT c_custkey, c_mktsegment, '2020-01-01', NULL, true
FROM customer WHERE NOT (c_custkey % 7 = 0 AND c_mktsegment <> 'UPDATED')
UNION ALL
SELECT c_custkey, 'UPDATED', '2024-01-01', NULL, true
FROM customer WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'UPDATED'
""",
    description="SCD Type-2 dimension merge (operators/scd.py: "
    "scd2_apply) — the versioned alternative to the reference's "
    "overwrite-in-place silver: a segment change CLOSES the current row "
    "(valid_to stamped, is_current=false) and inserts a new version; "
    "identical updates are no-ops (idempotent replays). Expressed as "
    "key-equi-join set algebra (no MERGE INTO needed on plain parquet); "
    "the update batch here is every 7th customer moving to segment "
    "'UPDATED' at a pinned timestamp, so the oracle enumerates the "
    "closed/untouched/new partitions declaratively",
    tags=("relational", "scd", "warehouse"),
)
def customer_scd2_segment_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tracks_etl_portfolio_spark.operators.scd import scd2_apply

    c = read_parquet_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("2020-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("UPDATED").alias("c_mktsegment")
    )
    return scd2_apply(
        dim,
        updates,
        key_cols=["c_custkey"],
        attr_cols=["c_mktsegment"],
        update_ts=F.lit("2024-01-01"),
    )


@register(
    "top10_customers_by_revenue_salted",
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
""",
    description="Skew-resistant twin of top10_customers_by_revenue: the "
    "lineitem⋈orders shuffle join runs SALTED (salt = hash(l_linenumber) "
    "mod 8 on the fact side, orders replicated 8×, join on (key, salt)) "
    "so a hot orderkey's rows spread over 8 reducers — bit-identical "
    "result, same oracle; the deliberate-salt pattern for when a single "
    "key exceeds one executor and AQE's skew split isn't enough",
    tags=("relational", "join", "topn", "skew"),
)
def top10_customers_by_revenue_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from spotify_tracks_etl_portfolio_spark.operators.joins import salted_join

    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    l = read_parquet_table(spark, sf_dir, "lineitem")
    lo = salted_join(l, o, "l_orderkey", "o_orderkey", "l_linenumber", buckets=8)
    return (
        lo.join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                .cast(_DEC)
            ).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "referential_integrity_checks",
    oracle="""
SELECT 'lineitem_without_order' AS check_name,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'order_without_customer',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem_without_part',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
""",
    description="Referential-integrity audit (the foreign-key DQ family "
    "the reference's MySQL schema enforced with constraints, "
    "reference: dags/sql/de_spotify_create_table.sql — Spark has no FK "
    "enforcement, so integrity becomes a declarative anti-join audit): "
    "orphaned fact rows per relationship in one result. Each check is a "
    "left-anti join that AQE turns into a broadcast probe when the "
    "parent's keys fit; counts are map-side partial",
    tags=("relational", "dq"),
)
def referential_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    o = read_parquet_table(spark, sf_dir, "orders")
    c = read_parquet_table(spark, sf_dir, "customer")
    p = read_parquet_table(spark, sf_dir, "part")

    def orphan_count(child, parent, ck, pk, name):
        return (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("check_name"), "n_orphans")
        )

    return (
        orphan_count(l, o, "l_orderkey", "o_orderkey", "lineitem_without_order")
        .unionByName(
            orphan_count(o, c, "o_custkey", "c_custkey", "order_without_customer")
        )
        .unionByName(
            orphan_count(l, p, "l_partkey", "p_partkey", "lineitem_without_part")
        )
    )


@register(
    "click_since_purchase_latency",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
matched AS (
  SELECT epoch_us(c.ts) - epoch_us(p.ts) AS lat_us
  FROM clicks c ASOF JOIN purchases p
    ON c.user_id = p.user_id AND c.ts >= p.ts
)
SELECT CAST(count(*) AS BIGINT) AS n_matched,
       round(quantile_cont(lat_us / 1e6, 0.50), 6) AS p50_s,
       round(quantile_cont(lat_us / 1e6, 0.90), 6) AS p90_s,
       round(quantile_cont(lat_us / 1e6, 0.99), 6) AS p99_s
FROM matched
""",
    description="Recency-latency distribution composed from the as-of "
    "join: per click, microseconds since the user's latest prior "
    "purchase, reduced to exact interpolated percentiles — the "
    "operator-composition shape (as-of union-merge → projection → "
    "percentile agg) stays one linear pipeline, no inequality join "
    "anywhere",
    tags=("relational", "asof", "stats"),
)
def click_since_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_tracks_etl_portfolio_spark.operators.joins import asof_join

    ev = read_parquet_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # how='inner' (the default) already drops unmatched clicks — no
    # NULL p_ts can reach this point
    joined = asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", right_prefix="p_"
    )
    lat_s = (F.unix_micros("ts") - F.unix_micros("p_ts")) / F.lit(1e6)
    matched = joined.select(lat_s.alias("lat_s"))
    return matched.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(F.percentile("lat_s", 0.50), 6).alias("p50_s"),
        F.round(F.percentile("lat_s", 0.90), 6).alias("p90_s"),
        F.round(F.percentile("lat_s", 0.99), 6).alias("p99_s"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
    description="TPC-H Q3 shipping-priority shape (testdata carries "
    "o_orderpriority instead of o_shippriority): segment-filtered "
    "broadcast dim, date predicates pushed to BOTH fact scans, group + "
    "top-10 via TakeOrderedAndProject — the classic filter-early "
    "join-late shape",
    tags=("relational", "tpch", "join", "topn"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = read_parquet_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    l = read_parquet_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(_revenue(l)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q12_shipmode_priority",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
""",
    description="TPC-H Q12 shape on the reduced testdata columns: "
    "conditional-aggregation pivot (CASE inside SUM — two measures from "
    "one pass), a cross-table inequality predicate (shipdate > "
    "orderdate) evaluated inside the equi-join, date window pushed to "
    "the fact scan",
    tags=("relational", "tpch"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet_table(spark, sf_dir, "orders")
    l = read_parquet_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
SELECT round(
         100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))
                          ELSE CAST(0 AS DECIMAL(24,8)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE),
         6) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
""",
    description="TPC-H Q14 shape: conditional share of a global "
    "aggregate in one pass (CASE'd DECIMAL sum over the same join), "
    "date window pushed to the fact scan, part side broadcast",
    tags=("relational", "tpch"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_parquet_table(spark, sf_dir, "part")
    l = read_parquet_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    rev = _revenue(l)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast(_DEC)
    )
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(24,8))) > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(24,8))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN big b ON b.l_orderkey = o.o_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
    description="TPC-H Q18 large-volume customers: HAVING on a grouped "
    "DECIMAL sum becomes a pre-aggregated semi-side joined back to the "
    "fact (group-filter-join decorrelation); AQE broadcasts the "
    "filtered key set, top-20 via TakeOrderedAndProject",
    tags=("relational", "tpch", "join", "topn"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    l = read_parquet_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "__bk"),
               F.col("l_orderkey") == F.col("__bk"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias(
                "total_qty"
            )
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "nation_revenue_ranks",
    oracle="""
WITH nr AS (
  SELECT n.n_name AS nation,
         SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8)))
           AS dec_rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT nation,
       CAST(dec_rev AS DOUBLE) AS revenue,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM nr
WINDOW w AS (ORDER BY dec_rev DESC, nation)
""",
    description="Ranking-function suite (rank / dense_rank / "
    "percent_rank / cume_dist) over PRE-AGGREGATED nation revenue: the "
    "unpartitioned ordered window sees 25 rows, never the fact table — "
    "the aggregate-then-window discipline for global rankings at scale; "
    "DECIMAL revenue makes the ORDER BY (and hence every rank) "
    "engine-deterministic",
    tags=("relational", "window"),
)
def nation_revenue_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    o = read_parquet_table(spark, sf_dir, "orders")
    c = read_parquet_table(spark, sf_dir, "customer")
    n = read_parquet_table(spark, sf_dir, "nation")
    nr = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue(l)).alias("dec_rev"))
    )
    w = Window.orderBy(F.desc("dec_rev"), F.asc("nation"))
    return nr.select(
        "nation",
        F.col("dec_rev").cast("double").alias("revenue"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("dense_rnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q7_nation_trade_volume",
    oracle="""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS volume,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY ns.n_name, nc.n_name
""",
    description="TPC-H Q7 trade-volume shape: the nation dimension joins "
    "TWICE under different roles (supplier's nation vs customer's "
    "nation — role-aliased broadcast dims), cross-nation filter, one "
    "grouped DECIMAL sum. The only query exercising the supplier table, "
    "closing full testdata-table coverage",
    tags=("relational", "tpch", "join"),
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    s = read_parquet_table(spark, sf_dir, "supplier")
    o = read_parquet_table(spark, sf_dir, "orders")
    c = read_parquet_table(spark, sf_dir, "customer")
    n = read_parquet_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("__ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("__nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__ns_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(_revenue(l)).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q10_returned_item_customers",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    description="TPC-H Q10 returned-item ranking: the returnflag filter "
    "pushes to the fact scan (PushedFilters), customer+nation broadcast, "
    "top-20 lossy customers via TakeOrderedAndProject",
    tags=("relational", "tpch", "join", "topn"),
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    n = read_parquet_table(spark, sf_dir, "nation")
    l = read_parquet_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue(l)).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "nation", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_promo_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 25)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
       AND l.l_quantity BETWEEN 10 AND 40)
""",
    description="TPC-H Q19 shape: disjunction of conjunctive predicate "
    "groups spanning both join sides — Catalyst extracts the part-only "
    "disjunction ((brand,size) OR-group) as a pushable part-scan filter "
    "while the mixed residual evaluates post-join; one DECIMAL sum",
    tags=("relational", "tpch", "join"),
)
def q19_disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    p = read_parquet_table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 25)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(5, 25)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond1 | cond2)
        .agg(
            F.sum(_revenue(l)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "cheapest_part_per_size",
    oracle="""
WITH pr AS (
  SELECT p_size, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_size
                            ORDER BY p_retailprice, p_partkey) AS rn
  FROM part
)
SELECT p_size, p_partkey AS cheapest_partkey, p_name AS cheapest_name,
       p_retailprice AS min_price
FROM pr WHERE rn = 1
""",
    description="Arg-min per group (the TPC-H Q2 min-cost-supplier "
    "shape, single-table form): ONE hash aggregation of "
    "min(struct(price, key, name)) — no window, no join-back, and the "
    "struct ordering makes the tie-break (smaller partkey) explicit "
    "where a bare min_by is nondeterministic under ties",
    tags=("relational", "tpch"),
)
def cheapest_part_per_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_parquet_table(spark, sf_dir, "part")
    best = p.groupBy("p_size").agg(
        F.min(F.struct("p_retailprice", "p_partkey", "p_name")).alias("__b")
    )
    return best.select(
        "p_size",
        F.col("__b.p_partkey").alias("cheapest_partkey"),
        F.col("__b.p_name").alias("cheapest_name"),
        F.col("__b.p_retailprice").alias("min_price"),
    )


@register(
    "q4_late_shipment_priority",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o.o_orderpriority
""",
    description="TPC-H Q4 shape: EXISTS-per-order decorrelated to a "
    "left-semi join (each order counted once no matter how many "
    "qualifying lineitems — a plain inner join would double-count), "
    "then a tiny priority rollup. The correlated inequality "
    "(shipdate > orderdate) rides inside the semi join condition",
    tags=("relational", "tpch", "join"),
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet_table(spark, sf_dir, "orders")
    l = read_parquet_table(spark, sf_dir, "lineitem")
    with_late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return with_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "q22_rich_customers_without_orders",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,8))) AS DOUBLE) / count(*) AS ab
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(24,8))) AS DOUBLE) AS total_acctbal
FROM customer c CROSS JOIN avg_bal a
WHERE c.c_acctbal > a.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_mktsegment
""",
    description="TPC-H Q22 shape: two decorrelations in one query — a "
    "global-average scalar subquery (broadcast 1-row DECIMAL-exact "
    "aggregate) filtering the dimension, then NOT EXISTS (no RECENT "
    "order — date-scoped so the check is non-degenerate on this data) "
    "as a left-anti join with the date filter pushed to the orders "
    "scan; per-segment rollup of the surviving rows",
    tags=("relational", "tpch", "join"),
)
def q22_rich_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    no_orders = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias(
            "total_acctbal"
        ),
    )


@register(
    "lineitem_column_stats",
    oracle="""
SELECT 'l_quantity' AS column_name,
       CAST(count(l_quantity) AS BIGINT) AS n,
       CAST(count(*) - count(l_quantity) AS BIGINT) AS n_null,
       CAST(count(DISTINCT l_quantity) AS BIGINT) AS ndv,
       round(min(l_quantity), 6) AS min_v,
       round(max(l_quantity), 6) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS BIGINT),
       CAST(count(*) - count(l_extendedprice) AS BIGINT),
       CAST(count(DISTINCT l_extendedprice) AS BIGINT),
       round(min(l_extendedprice), 6), round(max(l_extendedprice), 6)
FROM lineitem
UNION ALL
SELECT 'l_discount', CAST(count(l_discount) AS BIGINT),
       CAST(count(*) - count(l_discount) AS BIGINT),
       CAST(count(DISTINCT l_discount) AS BIGINT),
       round(min(l_discount), 6), round(max(l_discount), 6)
FROM lineitem
""",
    description="ANALYZE-TABLE-style column statistics (the CBO/stats "
    "collection operator): per column, non-null count, null count, "
    "exact NDV, min, max — computed in ONE scan by unpivoting the "
    "measures to (column_name, val) rows and aggregating per column "
    "(one pass + one shuffle, vs one scan per column the naive way; "
    "approx_count_distinct is the documented NDV knob at 100 TB)",
    tags=("relational", "stats"),
)
def lineitem_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    long = l.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount"], "column_name", "val"
    )
    return long.groupBy("column_name").agg(
        F.count("val").alias("n"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_null"),
        F.countDistinct("val").alias("ndv"),
        F.round(F.min("val"), 6).alias("min_v"),
        F.round(F.max("val"), 6).alias("max_v"),
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
    description="TPC-H Q5 local-supplier volume: 6-way star join whose "
    "supplier join carries a SECOND equi-condition (s_nationkey = "
    "c_nationkey — customer and supplier in the same nation), region "
    "filter reaching the nation dim, date filter pushed to the orders "
    "scan; all dims broadcast, the fact table never re-shuffles",
    tags=("relational", "tpch", "join"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_parquet_table(spark, sf_dir, "customer")
    o = read_parquet_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = read_parquet_table(spark, sf_dir, "lineitem")
    s = read_parquet_table(spark, sf_dir, "supplier")
    n = read_parquet_table(spark, sf_dir, "nation")
    r = read_parquet_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue(l)).cast("double").alias("revenue"))
    )


@register(
    "q8_nation_market_share",
    oracle="""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN ns.n_name = 'NATION_7'
                     THEN CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))
                     ELSE CAST(0 AS DECIMAL(24,8)) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
GROUP BY year(o.o_orderdate)
""",
    description="TPC-H Q8 national market share: nation joins twice "
    "under different roles (supplier nation feeds the CASE numerator, "
    "customer nation carries the region filter), part-type filter "
    "pushed to the broadcast part dim, conditional DECIMAL sum over "
    "total DECIMAL sum per order-year — one hash aggregation after a "
    "broadcast-only join tree",
    tags=("relational", "tpch", "join"),
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    p = read_parquet_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    s = read_parquet_table(spark, sf_dir, "supplier")
    o = read_parquet_table(spark, sf_dir, "orders")
    c = read_parquet_table(spark, sf_dir, "customer")
    n = read_parquet_table(spark, sf_dir, "nation")
    r = read_parquet_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    ns = n.select(
        F.col("n_nationkey").alias("__ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    # customer-side nations restricted to the region up front: the
    # region filter prunes the broadcast build instead of the fact rows
    nc = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("__nc_key"))
    )
    vol = _revenue(l)
    national = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__ns_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__nc_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(national).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total = (SELECT max(total) FROM rev)
""",
    description="TPC-H Q15 top supplier: quarterly per-supplier revenue "
    "CTE consumed twice — once for the 1-row global max (broadcast "
    "scalar-subquery decorrelation, same sanctioned shape as Q22's "
    "average), once as the probe filtered by DECIMAL-exact equality "
    "against it; supplier dim broadcast onto the one surviving row(s)",
    tags=("relational", "tpch", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_parquet_table(spark, sf_dir, "supplier")
    l = read_parquet_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(F.sum(_revenue(l)).alias("__tot"))
    mx = rev.agg(F.max("__tot").alias("__mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(F.col("__tot") == F.col("__mx"))
    return (
        top.join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__tot").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    description="TPC-H Q21 waiting-supplier shape (adapted: 'late' = "
    "shipped > 60 days after order date, since the testdata lineitem "
    "carries no commit/receipt dates): EXISTS decorrelated to a "
    "left-semi self-join (another supplier in the order), NOT EXISTS "
    "to a left-anti self-join whose condition references the OUTER "
    "order date (another supplier also late) — both ride the same "
    "l_orderkey shuffle key — then broadcast supplier and top-20 via "
    "TakeOrderedAndProject",
    tags=("relational", "tpch", "join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_parquet_table(spark, sf_dir, "supplier")
    o = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l = read_parquet_table(spark, sf_dir, "lineitem")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = l.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    l3 = l.select(
        F.col("l_orderkey").alias("__ok3"),
        F.col("l_suppkey").alias("__sk3"),
        F.col("l_shipdate").alias("__sd3"),
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("__ok2"))
        & (F.col("l_suppkey") != F.col("__sk2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("__ok3"))
        & (F.col("l_suppkey") != F.col("__sk3"))
        & (F.col("__sd3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        waiting.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "lineitem_grouping_sets",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       -- the varchar hop: DuckDB's direct decimal->double conversion can
       -- be 1 ulp off correctly-rounded at whole-table magnitude (int128
       -- / 10^8 in binary), while its string->double parse IS correctly
       -- rounded, matching Spark's decimal->double exactly
       CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    description="Explicit GROUPING SETS (the third grouping-analytics "
    "shape beside the registered CUBE and ROLLUP queries): three "
    "chosen aggregation levels in ONE scan + ONE Expand-fed hash "
    "aggregation rather than three scans unioned; grouping_id "
    "disambiguates genuine NULL keys from superaggregate rows, and "
    "both engines compute the identical (flag,status)/(flag)/() "
    "lattice",
    tags=("relational", "rollup"),
)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum(_revenue(l)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "revenue",
            "n_rows",
        )
    )

@register(
    "q9_nation_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                     - CAST(0.6 AS DOUBLE) * p.p_retailprice * l.l_quantity
                     AS DECIMAL(24,8))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
""",
    description="TPC-H Q9 product-type-profit shape (adapted: the "
    "testdata has no partsupp table, so unit supply cost is the "
    "deterministic proxy 0.6 * p_retailprice): part filter pushed "
    "into a broadcast build side prunes lineitem BEFORE the one big "
    "fact-fact shuffle (lineitem join orders on orderkey); supplier "
    "and nation are broadcast; per-row profit in DOUBLE, summed as "
    "DECIMAL(24,8) for order-insensitive exactness",
    tags=("relational", "tpch", "join"),
)
def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    p = read_parquet_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    s = read_parquet_table(spark, sf_dir, "supplier")
    n = read_parquet_table(spark, sf_dir, "nation")
    o = read_parquet_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
  -- NOT EXISTS, not NOT IN: the Spark side is a left_anti join, whose
  -- NULL-probe semantics (keep a NULL l_suppkey row) match NOT EXISTS
  -- exactly; NOT IN would instead drop NULL probes whenever the build
  -- side is non-empty — a latent divergence if the bridge ever carried
  -- NULL suppkeys
  AND NOT EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_suppkey = ps.l_suppkey AND s.s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    description="TPC-H Q16 supplier-relationship shape (adapted: the "
    "lineitem (partkey, suppkey) bridge stands in for partsupp, and "
    "'suppliers with complaints' becomes s_acctbal < 0): distinct "
    "bridge agg rides the same partkey shuffle as the count-distinct; "
    "the exclusion is a broadcast left-anti join, mirrored as NOT "
    "EXISTS in the oracle (same NULL-probe semantics, unlike NOT IN); "
    "brand/type/size predicates push into the broadcast part build "
    "side",
    tags=("relational", "tpch", "join"),
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    p = read_parquet_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
    )
    bad_suppliers = read_parquet_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(
            bad_suppliers,
            ps.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


@register(
    "q20_excess_quantity_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(24,8))) AS ps_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%bolt%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_partkey, l.l_suppkey
), part_totals AS (
  SELECT l_partkey, SUM(ps_qty) AS part_qty
  FROM shipped GROUP BY l_partkey
)
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT sh.l_suppkey
  FROM shipped sh
  JOIN part_totals pt ON pt.l_partkey = sh.l_partkey
  WHERE sh.ps_qty * 2 > pt.part_qty
)
ORDER BY s.s_name
""",
    description="TPC-H Q20 excess-inventory shape (adapted: no "
    "partsupp availqty, so the nested comparison becomes 'this "
    "supplier shipped more than half of the part's total 1997 "
    "volume'): inner agg per (partkey, suppkey) and the per-part "
    "total reuse ONE partkey shuffle; the threshold compare is exact "
    "decimal (2*x > total, no float division); the qualifying "
    "suppkey set semi-joins supplier — nested-aggregate decorrelation "
    "with zero driver round-trips",
    tags=("relational", "tpch", "join"),
)
def q20_excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    p = read_parquet_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    )
    s = read_parquet_table(spark, sf_dir, "supplier")
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("ps_qty"))
    )
    part_totals = shipped.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("ps_qty").alias("part_qty")
    )
    excess = (
        shipped.join(part_totals, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("ps_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(excess, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
elig AS (
  SELECT ps.l_partkey, ps.unit_cost, s.s_name, s.s_acctbal, n.n_name
  FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
mn AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM elig GROUP BY l_partkey)
SELECT CAST(e.s_acctbal AS DOUBLE) AS s_acctbal, e.s_name,
       e.n_name AS nation, p.p_partkey, p.p_type,
       round(e.unit_cost, 6) AS unit_cost
FROM elig e
JOIN mn ON e.l_partkey = mn.l_partkey AND e.unit_cost = mn.min_cost
JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
ORDER BY s_acctbal DESC, nation, e.s_name, p.p_partkey
LIMIT 100
""",
    description="TPC-H Q2 shape (minimum-cost supplier): the testdata has "
    "no partsupp table, so per-(part,supplier) unit cost is DERIVED from "
    "lineitem (min extendedprice/quantity — exact double math on both "
    "engines); region-filtered supplier dims broadcast onto the derived "
    "table, the part filter prunes BEFORE the per-part min (legal: the "
    "min is over eligible suppliers only, independent of part attrs, so "
    "pruning first shrinks the window input at scale), and the "
    "correlated min resolves as one window over l_partkey — no "
    "self-join, fully deterministic tie-broken top-100",
    tags=("relational", "tpch", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_parquet_table(spark, sf_dir, "lineitem")
    s = read_parquet_table(spark, sf_dir, "supplier")
    n = read_parquet_table(spark, sf_dir, "nation")
    r = read_parquet_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    elig = ps.join(dims, ps.l_suppkey == dims.s_suppkey)
    pf = read_parquet_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    elig_f = elig.join(pf, elig.l_partkey == pf.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        elig_f.withColumn("__mn", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("__mn"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "nation", "s_name", "p_partkey"
        )
        .limit(100)
    )

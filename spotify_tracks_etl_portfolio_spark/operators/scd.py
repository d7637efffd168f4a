"""Slowly-changing-dimension maintenance (warehouse surface).

The reference's silver layer overwrites in place (``reference:
dags/sql/de_spotify_silver.sql`` rebuilds the table); a
warehouse-grade engine also needs the versioned alternative — SCD
Type 2, where an attribute change CLOSES the current row
(``valid_to`` set, ``is_current`` false) and inserts a new version.
Spark has no MERGE INTO against plain parquet, so the merge is
expressed as pure DataFrame set algebra: one key-join to classify
updates, one semi/anti split of the current rows, one union. Every
piece is a narrow equi-join on the business key — at 100 TB both
sides shuffle once on the key (or zero times if the dimension is
bucketed on it), and the history partition is untouched (append-only).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    update_ts: Column,
) -> DataFrame:
    """Apply a batch of updates to an SCD Type-2 dimension.

    ``dim`` carries ``key_cols + attr_cols + (valid_from, valid_to,
    is_current)``; ``updates`` carries ``key_cols + attr_cols``.
    Semantics:

    - update with a CHANGED attr vs the current row → current row is
      closed (``valid_to = update_ts``, ``is_current = false``) and a
      new current version is inserted;
    - update identical to the current row → no-op (idempotent replays);
    - update for an unseen key → plain insert;
    - history rows (``is_current = false``) are never touched.

    ``update_ts`` must be a PINNED literal/column (never
    ``current_timestamp()`` evaluated per task) so retried tasks and
    the SQL oracle version rows identically.
    """
    cur = dim.filter(F.col("is_current"))
    cur_cmp = cur.select(
        *key_cols,
        *[F.col(a).alias(f"__cur_{a}") for a in attr_cols],
        F.lit(True).alias("__has_current"),
    )
    joined = updates.join(cur_cmp, key_cols, "left")
    changed: Column = reduce(
        lambda acc, a: acc
        | ~F.col(a).eqNullSafe(F.col(f"__cur_{a}")),
        attr_cols[1:],
        ~F.col(attr_cols[0]).eqNullSafe(F.col(f"__cur_{attr_cols[0]}")),
    )
    eff = joined.filter(
        changed | F.col("__has_current").isNull()
    ).select(*key_cols, *attr_cols, F.col("__has_current"))

    eff_cur_keys = eff.filter(F.col("__has_current")).select(*key_cols)
    closed = (
        cur.join(eff_cur_keys, key_cols, "left_semi")
        .withColumn("valid_to", update_ts)
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = cur.join(eff_cur_keys, key_cols, "left_anti")
    history = dim.filter(~F.col("is_current"))
    new_rows = eff.select(
        *key_cols,
        *attr_cols,
        update_ts.alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    cols = [*key_cols, *attr_cols, "valid_from", "valid_to", "is_current"]
    return (
        history.select(*cols)
        .unionByName(untouched_current.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(new_rows.select(*cols))
    )

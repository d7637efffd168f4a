"""Catalog / DDL operations (SURVEY.md §2.1 S5, S6, S8).

The reference's DDL surface is Jinja-templated MySQL executed per run:
``CREATE TABLE IF NOT EXISTS`` with 26 columns
(``reference: dags/sql/de_spotify_create_table.sql:1-34``) and
``CREATE TABLE ... LIKE`` for the silver clone
(``reference: dags/sql/de_spotify_silver.sql:5``). Spark-side these are
catalog calls against the session catalog with parquet storage; column
defaults become write-time ``withColumn``s (no server-side DEFAULT), and
the reference's broken index on a nonexistent column
(``reference: dags/sql/de_spotify_create_table.sql:34``) is deliberately
not replicated (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def create_table_idempotent(
    spark: SparkSession,
    name: str,
    schema: T.StructType,
    partition_by: list[str] | None = None,
    location: str | None = None,
) -> None:
    """``CREATE TABLE IF NOT EXISTS`` (S5) as a programmatic catalog call."""
    if spark.catalog.tableExists(name):
        return
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    clauses = [f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING parquet"]
    if partition_by:
        clauses.append(f"PARTITIONED BY ({', '.join(partition_by)})")
    if location:
        clauses.append(f"LOCATION '{location}'")
    spark.sql(" ".join(clauses))


def create_table_like(spark: SparkSession, target: str, source: str) -> None:
    """``CREATE TABLE ... LIKE`` (S6): clone the source's schema."""
    if spark.catalog.tableExists(target):
        return
    spark.sql(f"CREATE TABLE {target} LIKE {source}")


def insert_into(df: DataFrame, table: str, overwrite: bool = False) -> None:
    """``INSERT INTO ... SELECT`` (S8): set-based materialization into an
    existing table, by position like the SQL original."""
    df.write.insertInto(table, overwrite=overwrite)


def create_bucketed_table(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    bucket_col: str,
    n_buckets: int,
    location: str,
) -> None:
    """Write ``df`` as a BUCKETED catalog table: rows are hash-assigned
    to ``n_buckets`` files by ``bucket_col`` and sorted within each —
    Spark's persisted co-location primitive.

    This is the shuffle-elimination story the dedup/join docstrings
    promise at 100 TB: two tables bucketed on the join key with the
    same bucket count join with NO exchange on either side (the
    bucketed scan already satisfies the join's hash-distribution
    requirement) and, being sorted, with no sort either — a 100 TB
    fact-fact join becomes a zip of pre-sorted bucket pairs. The write
    pays one shuffle ONCE; every subsequent join/aggregation on the
    bucket key reads for free. ``location`` makes the table external so
    nothing lands in the session's default warehouse directory."""
    from pyspark.sql import functions as F

    (
        # one task per bucket → ONE file per bucket, which is the
        # condition under which Spark trusts the per-bucket sort order
        # and drops the local Sort below a sort-merge join entirely
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode("overwrite")
        .option("path", location)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )


def table_row_count(spark: SparkSession, table: str) -> int:
    """Post-load scalar check (S9;
    reference: dags/de_spotify_to_bronze.py:213-214)."""
    return spark.table(table).count()

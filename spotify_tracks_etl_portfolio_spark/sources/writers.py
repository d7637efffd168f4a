"""Sinks: load modes and partition-aware writes (SURVEY.md §2.1 S3-S6).

The reference has two load modes (``reference: dags/de_spotify_to_bronze.py``):
``full`` = TRUNCATE + insert (:193-196) and ``batch`` = append (:198-200),
selected by config with a guard that a *scheduled* run may not be a full
load (:58-60). Spark mapping: ``overwrite`` / ``append`` save modes.

Scale posture: bronze is partitioned by ``batch_identifier`` — the
idiomatic replacement for the reference's B-tree indexes
(``reference: dags/sql/de_spotify_create_table.sql:31-33``): partition
pruning + parquet min/max row-group skipping serve the same access paths.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame


class LoadMode(str, Enum):
    FULL = "full"  # TRUNCATE + insert ≡ overwrite
    BATCH = "batch"  # append


class ScheduledFullLoadError(ValueError):
    """A scheduled run may not request a full load
    (reference: dags/de_spotify_to_bronze.py:58-60)."""


def resolve_load_mode(load_type: str, run_type: str = "manual") -> LoadMode:
    mode = LoadMode(load_type)
    if mode is LoadMode.FULL and run_type == "scheduled":
        raise ScheduledFullLoadError(
            "load_type='full' is not allowed for scheduled runs"
        )
    return mode


def write_table(
    df: DataFrame,
    path: str,
    mode: LoadMode = LoadMode.BATCH,
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Write a table in the selected load mode.

    ``sort_within_partitions`` gives scan locality on a hot key (the
    analogue of the reference's ``idx_track_id``) without a global sort.
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode("overwrite" if mode is LoadMode.FULL else "append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    overwrite: bool = True,
) -> None:
    """Persist a managed table bucketed (hash-partitioned at WRITE time)
    on the join/aggregation key.

    This is the 100 TB co-location lever: two tables bucketed on the
    same key with the same bucket count join WITHOUT a shuffle — the
    SortMergeJoin reads bucket i of each side directly (verified in
    tests: zero Exchange nodes in the joined plan). Same effect for
    groupBy on the bucket key. At petabyte scale this converts every
    repeated fact-to-fact join from a full network shuffle into a local
    merge — the write-once cost is amortized over every downstream
    query. (Parquet path-based writes can't carry bucket metadata; this
    requires a catalog table, hence ``saveAsTable``.)
    """
    writer = (
        df.write.mode("overwrite" if overwrite else "append")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)

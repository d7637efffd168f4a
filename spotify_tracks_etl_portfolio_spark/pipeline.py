"""Medallion pipeline orchestration (SURVEY.md §2.11, §3.1-3.2).

The reference's two Airflow DAGs become two plain functions composed of
engine operators; the XCom hand-offs degenerate to Python return values
carrying ONLY metrics/stats — never rows (the reference serializes the
entire dataset through XCom, ``reference: dags/de_spotify_to_bronze.py:103-107``,
its main scalability cliff).

``run_bronze_ingest``  ≈ DAG ``csv_to_mysql_etl``
(reference: dags/de_spotify_to_bronze.py:37-411):
config → extract CSV → enrich metadata → pre-load validation (soft) →
load (full|batch) → post-load DQ suite (soft) → load report.

``run_silver_transform`` ≈ DAG ``de_spotify_silver``
(reference: dags/de_spotify_silver.py:24-221):
stats over raw bronze → impute/clamp/dedup transform → DQ suite (HARD).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.operators.dq import Suite, ValidationReport
from spotify_tracks_etl_portfolio_spark.operators.medallion import (
    enrich_ingest_metadata,
    nan_to_null,
    silver_transform,
)
from spotify_tracks_etl_portfolio_spark.sources.readers import read_csv
from spotify_tracks_etl_portfolio_spark.sources.writers import (
    LoadMode,
    resolve_load_mode,
    write_table,
)


@dataclass
class PipelineConfig:
    """The Airflow-Variable config surface
    (reference: dags/de_spotify_to_bronze.py:47-76)."""

    csv_path: str
    bronze_path: str
    silver_path: str
    load_type: str = "batch"
    run_type: str = "manual"
    source_identifier: str = "CSV"
    batch_identifier: str | None = None

    def resolved_batch_id(self) -> str:
        if self.batch_identifier:
            return self.batch_identifier
        now = datetime.now(timezone.utc)
        return f"batch_{now.strftime('%Y%m%d_%H%M%S')}"


@dataclass
class LoadReport:
    """The generate_load_report task's metrics dict
    (reference: dags/de_spotify_to_bronze.py:363-392)."""

    batch_identifier: str
    load_mode: str
    rows_extracted: int
    rows_loaded: int
    validation: dict[str, Any] = field(default_factory=dict)
    dq: dict[str, Any] = field(default_factory=dict)


def preload_validation(df: DataFrame, key_cols: list[str]) -> dict[str, Any]:
    """Pre-load pandas-style checks as one aggregation (soft gate;
    reference: dags/de_spotify_to_bronze.py:113-159 — failures only warn,
    the abort is commented out at :177-180)."""
    aggs = [F.count(F.lit(1)).alias("row_count")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in key_cols
    ]
    row = df.agg(*aggs).first()
    result = {"row_count": row["row_count"], "dtypes": dict(df.dtypes)}
    for c in key_cols:
        result[f"nulls_{c}"] = row[f"nulls_{c}"]
    result["success"] = all(row[f"nulls_{c}"] == 0 for c in key_cols)
    return result


def run_bronze_ingest(
    spark: SparkSession,
    config: PipelineConfig,
    csv_schema,
    key_cols: list[str],
    dq_suite: Suite | None = None,
    partition_by: list[str] | None = None,
) -> LoadReport:
    """CSV → validated, metadata-enriched bronze parquet."""
    mode = resolve_load_mode(config.load_type, config.run_type)
    batch_id = config.resolved_batch_id()

    raw = read_csv(spark, config.csv_path, schema=csv_schema)
    enriched = enrich_ingest_metadata(
        raw,
        source_identifier=config.source_identifier,
        batch_identifier=batch_id,
    )
    validation = preload_validation(enriched, key_cols)  # soft gate

    cleaned = nan_to_null(enriched)
    write_table(
        cleaned,
        config.bronze_path,
        mode=mode,
        partition_by=partition_by or ["batch_identifier"],
    )

    loaded = spark.read.parquet(config.bronze_path)
    dq_report: ValidationReport | None = None
    if dq_suite is not None:
        dq_report = dq_suite.run(loaded)  # soft gate on bronze (:357-361)

    return LoadReport(
        batch_identifier=batch_id,
        load_mode=mode.value,
        rows_extracted=validation["row_count"],
        rows_loaded=loaded.count(),
        validation=validation,
        dq=dq_report.to_dict() if dq_report else {},
    )


def run_silver_transform(
    spark: SparkSession,
    config: PipelineConfig,
    dedup_key: str | list[str],
    dedup_order: list[str],
    median_cols: list[str],
    mode_cols: list[str],
    clamps: dict[str, tuple[float, float]],
    dq_suite: Suite | None = None,
) -> dict[str, Any]:
    """Bronze → silver with the reference's two-phase stats semantics and
    a HARD DQ gate (reference: dags/de_spotify_silver.py:213-216)."""
    bronze = spark.read.parquet(config.bronze_path)
    silver = silver_transform(
        bronze, dedup_key, dedup_order, median_cols, mode_cols, clamps
    )
    write_table(silver, config.silver_path, mode=LoadMode.FULL)

    loaded = spark.read.parquet(config.silver_path)
    result: dict[str, Any] = {
        "rows_bronze": bronze.count(),
        "rows_silver": loaded.count(),
    }
    if dq_suite is not None:
        report = dq_suite.run(loaded)
        result["dq"] = report.to_dict()
        report.raise_on_failure()  # hard gate
    return result

"""Drop-in spotify pipeline: the reference's two DAGs with their exact
parameterization, pre-wired (a user of the reference switches here and
runs the same flow on Spark).

Bronze ≈ ``csv_to_mysql_etl`` (reference: dags/de_spotify_to_bronze.py):
same key-column pre-load checks (:127-137), same metadata enrichment
(:92-97), same load modes (:193-200), same GX expectation families
(:230-361, soft gate).

Silver ≈ ``de_spotify_silver`` (reference: dags/de_spotify_silver.py):
same 11 medians + 4 modes over raw bronze (:56-69), same dedup
(track_id, keep lowest `index`; dags/sql/de_spotify_silver.sql:40-44),
same clamps (:19-31), hard validation gate (:213-216).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from spotify_tracks_etl_portfolio_spark.operators.dq import Suite
from spotify_tracks_etl_portfolio_spark.pipeline import (
    LoadReport,
    PipelineConfig,
    run_bronze_ingest,
    run_silver_transform,
)
from spotify_tracks_etl_portfolio_spark.schemas import (
    SPOTIFY_CLAMPS,
    SPOTIFY_CSV_SCHEMA,
    SPOTIFY_MEDIAN_COLS,
    SPOTIFY_MODE_COLS,
)


def spotify_bronze_suite() -> Suite:
    """Bronze GX suite (reference: dags/de_spotify_to_bronze.py:277-343)
    with the value-range checks the reference *meant* (it misapplies
    string-length expectations to float columns there; SURVEY.md §5)."""
    return Suite(
        name="suite_csv_spotify_tracks",
        compound_unique=[["track_id", "batch_identifier"]],
        not_null=["track_id", "track_name", "artists"],
        between={
            "acousticness": (0.0, 1.0),
            "danceability": (0.0, 1.0),
            "instrumentalness": (0.0, 1.0),
            "loudness": (-60.0, 0.0),
        },
        column_types={
            "popularity": ("int", "bigint"),
            "duration_ms": ("int", "bigint"),
            "danceability": "double",
            "energy": "double",
        },
        row_count_min=1,
    )


def run_spotify_bronze(
    spark: SparkSession, csv_path: str, bronze_path: str, **config_kwargs
) -> LoadReport:
    config = PipelineConfig(
        csv_path=csv_path,
        bronze_path=bronze_path,
        silver_path="",
        **config_kwargs,
    )
    return run_bronze_ingest(
        spark,
        config,
        csv_schema=SPOTIFY_CSV_SCHEMA,
        key_cols=["track_id", "track_name", "artists"],
        dq_suite=spotify_bronze_suite(),
        partition_by=["batch_identifier"],
    )


def run_spotify_silver(
    spark: SparkSession, bronze_path: str, silver_path: str, **config_kwargs
) -> dict:
    from spotify_tracks_etl_portfolio_spark.operators.dq import (
        spotify_silver_suite,
    )

    config = PipelineConfig(
        csv_path="",
        bronze_path=bronze_path,
        silver_path=silver_path,
        **config_kwargs,
    )
    return run_silver_transform(
        spark,
        config,
        dedup_key="track_id",
        dedup_order=["index"],
        median_cols=SPOTIFY_MEDIAN_COLS,
        mode_cols=SPOTIFY_MODE_COLS,
        clamps=SPOTIFY_CLAMPS,
        dq_suite=spotify_silver_suite(),
    )

from spotify_tracks_etl_portfolio_spark.operators.medallion import (
    dedup_first,
    enrich_ingest_metadata,
    impute_and_clamp,
    silver_transform,
)
from spotify_tracks_etl_portfolio_spark.operators.stats import (
    column_medians,
    column_modes,
    compute_impute_stats,
)

__all__ = [
    "column_medians",
    "column_modes",
    "compute_impute_stats",
    "dedup_first",
    "enrich_ingest_metadata",
    "impute_and_clamp",
    "silver_transform",
]

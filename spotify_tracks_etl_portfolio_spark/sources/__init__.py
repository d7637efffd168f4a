from spotify_tracks_etl_portfolio_spark.sources.readers import (
    load_testdata,
    read_csv,
    read_parquet_table,
    register_testdata_views,
)
from spotify_tracks_etl_portfolio_spark.sources.writers import (
    LoadMode,
    write_table,
)

__all__ = [
    "LoadMode",
    "load_testdata",
    "read_csv",
    "read_parquet_table",
    "register_testdata_views",
    "write_table",
]

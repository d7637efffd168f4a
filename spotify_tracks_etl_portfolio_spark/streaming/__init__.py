from spotify_tracks_etl_portfolio_spark.streaming.pipeline import (
    read_events_stream,
    run_stream_to_completion,
    streaming_hourly_rollup,
    streaming_silver_events,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_completion",
    "streaming_hourly_rollup",
    "streaming_silver_events",
]

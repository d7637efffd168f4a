from spotify_tracks_etl_portfolio_spark.streaming.pipeline import (
    drain_events_stream_to_table,
    pinned_stream_session,
    read_events_stream,
    run_stream_to_completion,
    stream_session,
    streaming_click_purchase_join,
    streaming_dedup_events,
    streaming_enrich_events,
    streaming_hourly_rollup,
    streaming_incremental_dedup,
    streaming_silver_events,
)

__all__ = [
    "drain_events_stream_to_table",
    "pinned_stream_session",
    "read_events_stream",
    "run_stream_to_completion",
    "stream_session",
    "streaming_click_purchase_join",
    "streaming_dedup_events",
    "streaming_enrich_events",
    "streaming_hourly_rollup",
    "streaming_incremental_dedup",
    "streaming_silver_events",
]

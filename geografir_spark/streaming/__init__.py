from geografir_spark.streaming.ingest import (  # noqa: F401
    pages_stream,
    run_available_now,
    run_tile_pyramid_stream,
    stream_cell_counts,
    stream_dedup_latest,
    stream_interval_join,
    stream_user_sessions,
)

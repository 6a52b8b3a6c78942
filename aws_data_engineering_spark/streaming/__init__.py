from aws_data_engineering_spark.streaming.streams import (  # noqa: F401
    dedup_stream,
    purchase_click_attribution,
    read_events_stream,
    read_rollup_view,
    run_to_file_sink,
    run_to_memory_sink,
    running_user_totals,
    session_window_counts,
    sessionize_with_state,
    stream_partial_rollup_sink,
    stream_upsert_sink,
    windowed_counts,
)

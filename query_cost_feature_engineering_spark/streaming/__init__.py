from query_cost_feature_engineering_spark.streaming.sessions import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    tumbling_counts_stream,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
    "tumbling_counts_stream",
]

from query_cost_feature_engineering_spark.streaming.upsert import (  # noqa: E402
    apply_cdc_batch,
    latest_per_key,
    stream_upsert_to_table,
)

__all__ += [
    "apply_cdc_batch",
    "latest_per_key",
    "stream_upsert_to_table",
]

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

from query_cost_feature_engineering_spark.runtime.checkpoint import (
    completed_partitions,
    input_fingerprint,
    write_resumable,
)

__all__ = ["completed_partitions", "input_fingerprint", "write_resumable"]

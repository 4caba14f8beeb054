from query_cost_feature_engineering_spark.runtime.checkpoint import (
    completed_partitions,
    input_fingerprint,
    write_resumable,
)
from query_cost_feature_engineering_spark.runtime.layout import (
    pruning_ratio,
    read_pruned,
    write_range_layout,
)

__all__ = [
    "completed_partitions",
    "input_fingerprint",
    "write_resumable",
    "pruning_ratio",
    "read_pruned",
    "write_range_layout",
]

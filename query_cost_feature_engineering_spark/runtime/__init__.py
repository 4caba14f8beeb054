from query_cost_feature_engineering_spark.runtime.checkpoint import (
    completed_partitions,
    input_fingerprint,
    write_resumable,
)
from query_cost_feature_engineering_spark.runtime.layout import (
    pruning_ratio,
    read_pruned,
    write_range_layout,
    write_zorder_layout,
)
from query_cost_feature_engineering_spark.runtime.snapshots import (
    compact_table,
    delete_where,
    read_changes,
    txn_version,
    expire_snapshots,
    merge_into,
    read_table,
    snapshot_log,
    write_snapshot,
)

__all__ = [
    "completed_partitions",
    "input_fingerprint",
    "write_resumable",
    "pruning_ratio",
    "read_pruned",
    "write_range_layout",
    "write_zorder_layout",
    "compact_table",
    "delete_where",
    "expire_snapshots",
    "merge_into",
    "read_table",
    "read_changes",
    "txn_version",
    "snapshot_log",
    "write_snapshot",
]

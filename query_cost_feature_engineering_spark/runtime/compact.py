"""Small-file compaction — table-maintenance utility for the feature sink.

Long-running incremental pipelines accumulate small files (every
checkpointed partition write adds a few); scan cost at 100 TB is
dominated by file-open overhead once files drop below ~tens of MB. This
rewrites a parquet dir to approximately ``target_bytes`` per file by
estimating bytes/row from the current files (with an Iceberg catalog this
is `rewrite_data_files`; for plain parquet dirs this is the equivalent).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession


def table_file_stats(path: str) -> dict:
    files = [f for f in Path(path).rglob("*.parquet")]
    sizes = [f.stat().st_size for f in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
    }


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> dict:
    """Rewrite ``path`` into ~target_bytes files; preserves rows exactly.
    With ``partition_col`` the layout (hive-style dirs) is preserved and
    compaction happens within partitions."""
    before = table_file_stats(path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    bytes_per_row = max(before["total_bytes"] / max(n_rows, 1), 1.0)
    rows_per_file = max(int(target_bytes / bytes_per_row), 1)

    tmp = path.rstrip("/") + "__compact_tmp"
    n_out = max(int(before["total_bytes"] / target_bytes), 1)
    parts = (
        df.repartition(n_out, partition_col)
        if partition_col
        else df.repartition(n_out)
    )
    w = parts.write.mode("overwrite").option("maxRecordsPerFile", rows_per_file)
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(tmp)

    # verify row count, then swap via rename-aside: the original is moved
    # to <path>__old BEFORE the new data moves in, so no instant exists
    # where the dataset is deleted — a crash mid-swap leaves both the
    # backup and the compacted tmp on disk, recoverable by rename.
    n_new = spark.read.parquet(tmp).count()
    if n_new != n_rows:
        raise RuntimeError(f"compaction row mismatch: {n_rows} -> {n_new}")
    import os
    import shutil

    backup = path.rstrip("/") + "__old"
    if Path(backup).exists():
        shutil.rmtree(backup)  # stale leftover from an earlier crash
    os.rename(path, backup)
    os.rename(tmp, path)
    # a write_resumable output carries resume/lineage manifests — preserve
    # them through compaction (data rows are unchanged, lineage still holds)
    old_manifest = Path(backup) / "_manifest"
    if old_manifest.is_dir():
        shutil.move(str(old_manifest), str(Path(path) / "_manifest"))
    shutil.rmtree(backup)
    after = table_file_stats(path)
    return {"rows": n_rows, "before": before, "after": after}

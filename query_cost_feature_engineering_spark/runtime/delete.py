"""Targeted key deletion from the partitioned feature store.

The right-to-be-forgotten path: drop every row of a set of entities
from a ``write_resumable`` store WITHOUT rewriting the store. The
store is laid out as ``part_id = pmod(xxhash64(key), n_buckets)``
(`runtime/checkpoint.py`), so the same hash prunes the rewrite to the
partitions that can contain the keys — at 1000 partitions deleting a
handful of entities rewrites ~handful of partitions and leaves every
other file byte-identical (pinned by test).

Two semantics notes the caller must own:
- dynamic partition overwrite only replaces partitions PRESENT in the
  written data, so a partition whose rows are all deleted would be
  silently left behind — those directories are removed explicitly here;
- deletion is a STORE-level operation: the per-partition manifests are
  updated (row count + deletion lineage) so resume stays consistent,
  but a later full recompute from sources that still contain the keys
  will resurrect them — forget upstream too.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.runtime.checkpoint import (
    MANIFEST_DIR,
)


def delete_keys(
    spark: SparkSession,
    out_dir: str,
    keys: list,
    bucket_col: str = "entity_bucket",
    n_buckets: int = 8,
) -> dict:
    """Remove all rows whose ``bucket_col`` is in ``keys``; rewrite only
    the partitions the keys hash into. Returns
    {"partitions": [...], "removed_empty": [...], "rows_deleted": int}."""
    store = spark.read.parquet(out_dir)
    # xxhash64 is TYPE-sensitive (xxhash64(7 as int) != xxhash64(7 as
    # long)); a driver-built keys frame infers Python-long → bigint, so
    # hash the keys in the store column's ACTUAL type or the wrong
    # partitions get pruned and the rows silently survive deletion.
    store_type = dict(store.dtypes)[bucket_col]
    kdf = spark.createDataFrame([(k,) for k in keys], [bucket_col]).select(
        F.col(bucket_col).cast(store_type).alias(bucket_col)
    )
    part_of = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast(
        "int"
    )
    parts = sorted(
        r.part_id
        for r in kdf.select(part_of.alias("part_id")).distinct().collect()
    )

    affected = store.filter(F.col("part_id").isin(parts))
    n_before = affected.count()
    keep = affected.join(F.broadcast(kdf), on=bucket_col, how="left_anti")

    # surviving-row counts BEFORE the overwrite: the `keep` plan reads the
    # old files, which stop existing the moment the rewrite commits — any
    # post-write evaluation of it would hit FILE_NOT_EXIST
    kept_counts = {
        r.part_id: r.cnt
        for r in keep.groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }

    # partitions that still have rows get rewritten in place...
    (
        keep.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(out_dir)
    )
    # ...partitions emptied by the deletion are absent from `keep`, so
    # dynamic overwrite never touches them — remove their dirs explicitly
    removed = []
    for p in parts:
        if p not in kept_counts:
            shutil.rmtree(Path(out_dir) / f"part_id={p}", ignore_errors=True)
            removed.append(p)

    n_after = sum(kept_counts.values())

    # keep resume metadata truthful: new row counts + deletion lineage
    mdir = Path(out_dir) / MANIFEST_DIR
    for p in parts:
        mf = mdir / f"part={p}.json"
        if not mf.is_file():
            continue
        rec = json.loads(mf.read_text())
        rec["rows"] = int(kept_counts.get(p, 0))
        rec.setdefault("deletions", []).append(
            {"n_keys": len(keys), "bucket_col": bucket_col}
        )
        tmp = mdir / f".part={p}.json.tmp"
        tmp.write_text(json.dumps(rec, sort_keys=True))
        tmp.replace(mf)

    return {
        "partitions": parts,
        "removed_empty": removed,
        "rows_deleted": int(n_before - n_after),
    }

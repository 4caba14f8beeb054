"""Compaction: fewer/bigger files, content byte-identical."""

from __future__ import annotations

import pandas as pd

from query_cost_feature_engineering_spark.runtime.compact import (
    compact_parquet_dir,
    table_file_stats,
)


def test_compact_preserves_content(spark, tmp_path):
    src = str(tmp_path / "t")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.repartition(64).write.parquet(src)  # 64 tiny files
    assert table_file_stats(src)["n_files"] >= 64
    before = (
        spark.read.parquet(src).toPandas().sort_values("event_id").reset_index(drop=True)
    )
    res = compact_parquet_dir(spark, src, target_bytes=1 << 30)
    assert res["after"]["n_files"] < res["before"]["n_files"]
    assert res["after"]["n_files"] <= 2
    after = (
        spark.read.parquet(src).toPandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)


def test_compact_preserves_manifest_and_survives(spark, tmp_path):
    """Compacting a write_resumable output must keep the _manifest dir
    (resume/lineage metadata) and leave no __old backup behind."""
    from pathlib import Path

    from query_cost_feature_engineering_spark.runtime.checkpoint import (
        completed_partitions,
        write_resumable,
    )

    src = str(tmp_path / "src")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)
    df = spark.read.parquet(src)
    out = str(tmp_path / "out")
    write_resumable(df, out, "user_id", 4, [src])
    done_before = completed_partitions(out, bucket_col="user_id", n_buckets=4)
    assert len(done_before) == 4

    n_before = spark.read.parquet(out).count()
    compact_parquet_dir(spark, out, target_bytes=1 << 20,
                        partition_col="part_id")
    assert spark.read.parquet(out).count() == n_before
    assert (Path(out) / "_manifest").is_dir()
    assert completed_partitions(out, bucket_col="user_id", n_buckets=4) == done_before
    assert not Path(out + "__old").exists()

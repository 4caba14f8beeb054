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

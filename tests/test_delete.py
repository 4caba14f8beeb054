"""Targeted deletion: only the partitions the keys hash into are
rewritten, emptied partitions disappear, untouched files stay
byte-identical, manifests stay truthful."""

from __future__ import annotations

import glob
import hashlib
import json
from pathlib import Path

import pyspark.sql.functions as F

from query_cost_feature_engineering_spark.runtime.checkpoint import (
    write_resumable,
)
from query_cost_feature_engineering_spark.runtime.delete import delete_keys

N_BUCKETS = 8


def _file_hashes(out_dir):
    return {
        p: hashlib.md5(Path(p).read_bytes()).hexdigest()
        for p in glob.glob(f"{out_dir}/part_id=*/*.parquet")
    }


def _store(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "store")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(
        src
    )
    df = spark.read.parquet(src)
    write_resumable(df, out, "user_id", N_BUCKETS, [src])
    return df, out


def test_delete_prunes_to_affected_partitions(spark, tmp_path):
    df, out = _store(spark, tmp_path)
    keys = [3, 17]
    before = _file_hashes(out)
    res = delete_keys(spark, out, keys, "user_id", N_BUCKETS)

    # content == anti-join of the original
    want = df.join(
        spark.createDataFrame([(k,) for k in keys], ["user_id"]),
        "user_id",
        "left_anti",
    )
    got = spark.read.parquet(out).drop("part_id")
    assert got.count() == want.count()
    assert (
        got.groupBy("user_id").count().orderBy("user_id").collect()
        == want.groupBy("user_id").count().orderBy("user_id").collect()
    )
    n_key_rows = df.filter(F.col("user_id").isin(keys)).count()
    assert n_key_rows > 0
    assert res["rows_deleted"] == n_key_rows

    # only partitions the keys hash into were touched
    after = _file_hashes(out)
    touched_dirs = {f"part_id={p}" for p in res["partitions"]}
    for path, h in before.items():
        part = Path(path).parent.name
        if part not in touched_dirs:
            assert after.get(path) == h, f"untouched file rewritten: {path}"

    # manifests report the new row counts
    for p in res["partitions"]:
        rec = json.loads(
            (Path(out) / "_manifest" / f"part={p}.json").read_text()
        )
        actual = (
            spark.read.parquet(out)
            .filter(F.col("part_id") == p)
            .count()
            if (Path(out) / f"part_id={p}").is_dir()
            else 0
        )
        assert rec["rows"] == actual
        assert rec["deletions"][0]["n_keys"] == len(keys)


def test_delete_removes_emptied_partition(spark, tmp_path):
    df, out = _store(spark, tmp_path)
    # delete EVERY key of one partition -> its directory must vanish
    target = 0
    part_of = F.pmod(F.xxhash64(F.col("user_id")), F.lit(N_BUCKETS)).cast(
        "int"
    )
    keys = [
        r.user_id
        for r in df.select("user_id", part_of.alias("p"))
        .filter(F.col("p") == target)
        .select("user_id")
        .distinct()
        .collect()
    ]
    assert keys
    res = delete_keys(spark, out, keys, "user_id", N_BUCKETS)
    assert target in res["removed_empty"]
    assert not (Path(out) / f"part_id={target}").exists()
    left = spark.read.parquet(out)
    assert left.filter(F.col("user_id").isin(keys)).count() == 0


def test_delete_then_compact_preserves_content_and_manifests(spark, tmp_path):
    """Lifecycle integration: targeted deletion followed by small-file
    compaction must keep the surviving rows exactly and keep the resume
    manifests (compaction preserves `_manifest`; deletion updated it)."""
    from query_cost_feature_engineering_spark.runtime.compact import (
        compact_parquet_dir,
    )

    df, out = _store(spark, tmp_path)
    keys = [5, 9, 42]
    delete_keys(spark, out, keys, "user_id", N_BUCKETS)
    want = sorted(
        (r.event_id, r.user_id)
        for r in spark.read.parquet(out).drop("part_id").collect()
    )

    compact_parquet_dir(spark, out, target_bytes=1 << 20,
                        partition_col="part_id")

    got = sorted(
        (r.event_id, r.user_id)
        for r in spark.read.parquet(out).drop("part_id").collect()
    )
    assert got == want
    assert not spark.read.parquet(out).filter(
        F.col("user_id").isin(keys)
    ).count()
    manifests = list((Path(out) / "_manifest").glob("part=*.json"))
    assert manifests, "compaction must preserve the manifest dir"

"""Snapshot-versioned table: time travel, copy-on-write delete/merge,
atomic commits, expiry. Verifies the Iceberg-parity semantics of
runtime/snapshots.py on a real on-disk table."""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.runtime import snapshots as S


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "grp", "val"])


def _as_dict(df):
    return {r["k"]: (r["grp"], r["val"]) for r in df.collect()}


def _file_digests(table_dir, files):
    root = Path(table_dir)
    return {f: hashlib.sha256((root / f).read_bytes()).hexdigest() for f in files}


@pytest.fixture()
def table(tmp_path, spark):
    d = str(tmp_path / "tbl")
    base = _mk(spark, [(i, i % 3, float(i)) for i in range(100)]).repartition(4, "k")
    S.write_snapshot(base, d, mode="overwrite")
    return d


def test_append_and_time_travel(spark, table):
    v1 = S.current_version(table)
    S.write_snapshot(_mk(spark, [(1000, 9, 1.5)]), table, mode="append")
    assert S.current_version(table) == v1 + 1
    assert S.read_table(spark, table).count() == 101
    # time travel: v1 still reads the original 100 rows
    assert S.read_table(spark, table, version=v1).count() == 100
    log = S.snapshot_log(table)
    assert [e["operation"] for e in log] == ["overwrite", "append"]
    assert log[-1]["parent"] == v1


def test_overwrite_keeps_history(spark, table):
    v1 = S.current_version(table)
    S.write_snapshot(_mk(spark, [(1, 1, -1.0)]), table, mode="overwrite")
    assert S.read_table(spark, table).count() == 1
    assert S.read_table(spark, table, version=v1).count() == 100


def test_delete_where_copy_on_write(spark, table):
    v1 = S.current_version(table)
    before = S.snapshot_meta(table, v1)["files"]
    digests_before = _file_digests(table, before)
    res = S.delete_where(spark, table, "grp = 1")
    assert res["rows_deleted"] == 33  # 1,4,...,97
    cur = S.read_table(spark, table)
    assert cur.filter("grp = 1").count() == 0
    assert cur.count() == 67
    # copy-on-write: files carried into the new snapshot are byte-identical
    after = S.snapshot_meta(table)["files"]
    carried = [f for f in after if f in digests_before]
    for f in carried:
        assert _file_digests(table, [f])[f] == digests_before[f]
    # time travel still sees the deleted rows
    assert S.read_table(spark, table, version=v1).filter("grp = 1").count() == 33


def test_delete_where_prunes_rewrite_to_affected_files(spark, tmp_path):
    # one file per k-range: deleting k<25 must rewrite exactly 1 of 4 files
    d = str(tmp_path / "pruned")
    df = _mk(spark, [(i, 0, float(i)) for i in range(100)]).repartitionByRange(4, "k")
    S.write_snapshot(df, d, mode="overwrite")
    n_files_before = len(S.snapshot_meta(d)["files"])
    res = S.delete_where(spark, d, "k < 25")
    assert res["files_rewritten"] < n_files_before


def test_merge_upsert_semantics(spark, table):
    # updates: k in {0,1,2} get val*10; inserts: k in {200,201}
    src = _mk(
        spark,
        [(0, 0, 0.0), (1, 1, 10.0), (2, 2, 20.0), (200, 7, -7.0), (201, 8, None)],
    )
    res = S.merge_into(spark, table, src, on=["k"])
    assert res["version"] == S.current_version(table)
    cur = _as_dict(S.read_table(spark, table))
    assert len(cur) == 102
    assert cur[1] == (1, 10.0) and cur[2] == (2, 20.0)
    assert cur[200] == (7, -7.0)
    # matched rows take source values INCLUDING NULL (presence flag, not coalesce)
    assert cur[201] == (8, None)
    # untouched rows unchanged
    assert cur[50] == (50 % 3, 50.0)


def test_merge_rejects_duplicate_source_keys(spark, table):
    src = _mk(spark, [(1, 0, 0.0), (1, 0, 1.0)])
    with pytest.raises(ValueError, match="duplicate keys"):
        S.merge_into(spark, table, src, on=["k"])


def test_merge_carries_unaffected_files_by_reference(spark, tmp_path):
    d = str(tmp_path / "m")
    df = _mk(spark, [(i, 0, float(i)) for i in range(100)]).repartitionByRange(4, "k")
    S.write_snapshot(df, d, mode="overwrite")
    meta1 = S.snapshot_meta(d)
    src = _mk(spark, [(3, 9, 99.0)])  # touches exactly one range file
    res = S.merge_into(spark, d, src, on=["k"])
    assert res["files_rewritten"] == 1
    assert res["files_carried"] == len(meta1["files"]) - 1
    cur = _as_dict(S.read_table(spark, d))
    assert cur[3] == (9, 99.0) and len(cur) == 100


def test_crash_before_commit_leaves_table_readable(spark, table):
    """Simulate a crash between data write and snapshot commit: orphan
    files appear under data/ but CURRENT and reads are unaffected; expiry
    removes the orphans."""
    v1 = S.current_version(table)
    orphan = S._write_data(_mk(spark, [(5000, 0, 0.0)]), table, v1 + 1)
    assert orphan  # files exist on disk...
    assert S.current_version(table) == v1  # ...but the table is unchanged
    assert S.read_table(spark, table).count() == 100
    res = S.expire_snapshots(table, keep_last=1)
    assert res["data_files_removed"] == len(orphan)
    assert S.read_table(spark, table).count() == 100


def test_expire_snapshots_gc(spark, table):
    v1 = S.current_version(table)
    S.delete_where(spark, table, "grp = 0")
    S.write_snapshot(_mk(spark, [(999, 9, 9.0)]), table, mode="append")
    res = S.expire_snapshots(table, keep_last=1)
    assert v1 in res["snapshots_dropped"]
    # latest still reads fine; expired version no longer readable
    assert S.read_table(spark, table).count() == 100 - 34 + 1  # grp=0: 34 rows
    with pytest.raises(FileNotFoundError):
        S.snapshot_meta(table, v1)


def test_schema_preserved_through_empty_snapshot(spark, tmp_path):
    d = str(tmp_path / "empty")
    S.write_snapshot(_mk(spark, [(1, 1, 1.0)]), d, mode="overwrite")
    S.delete_where(spark, d, "k = 1")
    cur = S.read_table(spark, d)
    assert cur.count() == 0
    assert [f.name for f in cur.schema.fields] == ["k", "grp", "val"]


def test_read_changes_append_fast_path_reads_only_added_files(spark, table):
    """Incremental scan over append-only history touches ONLY the files
    the commits added — never the base table."""
    v1 = S.current_version(table)
    S.write_snapshot(_mk(spark, [(500, 5, 5.0)]), table, mode="append")
    S.write_snapshot(_mk(spark, [(501, 5, 5.5)]), table, mode="append")
    v3 = S.current_version(table)
    ch = S.read_changes(spark, table, v1, v3)
    got = sorted(r.k for r in ch.collect())
    assert got == [500, 501]
    base_files = {
        str(Path(table) / f) for f in S.snapshot_meta(table, v1)["files"]
    }
    touched = {f.removeprefix("file:") for f in ch.inputFiles()}
    assert touched.isdisjoint(base_files)
    # empty range
    assert S.read_changes(spark, table, v3, v3).count() == 0


def test_read_changes_rewrite_falls_back_to_exact_diff(spark, table):
    """A merge in the range forces the row-level diff: carried-over rows
    must NOT appear as changes."""
    v1 = S.current_version(table)
    src = _mk(spark, [(0, 9, -1.0), (700, 7, 7.0)])  # update k=0, insert 700
    S.merge_into(spark, table, src, on=["k"])
    ch = {r.k: (r.grp, r.val) for r in S.read_changes(spark, table, v1).collect()}
    assert ch == {0: (9, -1.0), 700: (7, 7.0)}


def test_schema_evolution_additive_append(spark, table):
    """Appending rows with a NEW column evolves the snapshot schema;
    old files surface the column as null, history keeps the old shape."""
    v1 = S.current_version(table)
    evolved = spark.createDataFrame(
        [(2000, 1, 1.0, "x")], ["k", "grp", "val", "tag"]
    )
    S.write_snapshot(evolved, table, mode="append")
    cur = S.read_table(spark, table)
    assert [f.name for f in cur.schema.fields] == ["k", "grp", "val", "tag"]
    assert cur.count() == 101
    assert cur.filter("tag IS NULL").count() == 100  # old rows
    assert cur.filter("tag = 'x'").count() == 1
    # time travel reads the pre-evolution shape
    old = S.read_table(spark, table, version=v1)
    assert [f.name for f in old.schema.fields] == ["k", "grp", "val"]


def test_schema_evolution_rejects_type_change(spark, table):
    bad = spark.createDataFrame([(1, 1, "not-a-double")], ["k", "grp", "val"])
    with pytest.raises(ValueError, match="additive-only"):
        S.write_snapshot(bad, table, mode="append")


def test_compact_table_rewrites_files_not_rows(spark, table):
    """Many small appended files compact into fewer; rows identical;
    incremental consumers see zero changes across the compaction."""
    for i in range(5):
        S.write_snapshot(
            _mk(spark, [(10_000 + i, 0, float(i))]), table, mode="append"
        )
    v_before = S.current_version(table)
    before = _as_dict(S.read_table(spark, table))
    n_files_before = len(S.snapshot_meta(table)["files"])
    res = S.compact_table(spark, table)
    assert res["files_after"] < n_files_before
    assert res["rows"] == 105
    assert _as_dict(S.read_table(spark, table)) == before
    # history still readable, and the compaction produced no row changes
    assert S.read_table(spark, table, version=v_before).count() == 105
    assert S.read_changes(spark, table, v_before).count() == 0

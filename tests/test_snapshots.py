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


# --- manifest stats + file pruning + rollback (round 5, session 4) ----------


def _ranged(spark, n=400, buckets=8):
    df = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(n)], ["k", "grp", "val"]
    )
    return df.repartitionByRange(buckets, "k")


def test_commit_records_per_file_stats(spark, tmp_path):
    d = str(tmp_path / "tbl")
    S.write_snapshot(_ranged(spark), d, mode="overwrite")
    meta = S.snapshot_meta(d)
    assert set(meta["stats"]) == set(meta["files"])
    ks = [s["k"] for s in meta["stats"].values() if "k" in s]
    assert len(ks) == len(meta["files"])
    # bounds cover exactly the written domain and files are disjoint-ranged
    assert min(s["min"] for s in ks) == 0
    assert max(s["max"] for s in ks) == 399
    spans = sorted((s["min"], s["max"]) for s in ks)
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi < blo  # repartitionByRange ⇒ non-overlapping key ranges
    for s in ks:
        assert s["null_count"] == 0


def test_pruned_read_is_exact_and_reads_fewer_files(spark, tmp_path):
    d = str(tmp_path / "tbl")
    S.write_snapshot(_ranged(spark), d, mode="overwrite")
    total = len(S.snapshot_meta(d)["files"])
    kept, pruned = S.prune_files(d, [("k", "<=", 30)])
    assert pruned and len(kept) < total
    df = S.read_table(spark, d, where=[("k", "<=", 30)])
    # the Spark scan's file list is the pruned list, not the snapshot's
    assert len(df.inputFiles()) == len(kept)
    expect = {(i, i % 5, float(i)) for i in range(31)}
    assert {(r.k, r.grp, r.val) for r in df.collect()} == expect


def test_prune_point_lookup_keeps_one_file(spark, tmp_path):
    d = str(tmp_path / "tbl")
    S.write_snapshot(_ranged(spark), d, mode="overwrite")
    kept, _ = S.prune_files(d, [("k", "=", 200)])
    assert len(kept) == 1
    got = S.read_table(spark, d, where=[("k", "=", 200)]).collect()
    assert [(r.k, r.grp, r.val) for r in got] == [(200, 0, 200.0)]


def test_prune_conjunction_and_string_bounds(spark, tmp_path):
    d = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"id_{i:04d}") for i in range(100)], ["k", "name"]
    ).repartitionByRange(4, "k")
    S.write_snapshot(df, d, mode="overwrite")
    kept, pruned = S.prune_files(d, [("k", ">=", 80), ("name", ">=", "id_0080")])
    assert pruned
    got = S.read_table(
        spark, d, where=[("k", ">=", 80), ("name", ">=", "id_0080")]
    )
    assert got.count() == 20


def test_prune_missing_stats_is_conservative(spark, tmp_path):
    """A column with no recorded bounds (all-NULL strings: parquet writes
    no min/max) never prunes; residual filters still make the read exact."""
    d = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, None) for i in range(50)], "k int, tag string"
    )
    S.write_snapshot(df, d, mode="overwrite")
    stats = S.snapshot_meta(d)["stats"]
    assert all("tag" not in s for s in stats.values())
    kept, pruned = S.prune_files(d, [("tag", "=", "x")])
    assert not pruned  # cannot prove absence without bounds
    assert S.read_table(spark, d, where=[("tag", "=", "x")]).count() == 0


def test_stats_carry_through_merge_and_survive_pruning(spark, tmp_path):
    """Carried (unrewritten) files keep their original bounds through a
    copy-on-write MERGE, and pruning works across the mixed snapshot."""
    d = str(tmp_path / "tbl")
    S.write_snapshot(_ranged(spark), d, mode="overwrite")
    src = spark.createDataFrame([(5, 99, -1.0)], ["k", "grp", "val"])
    S.merge_into(spark, d, src, on=["k"])
    meta = S.snapshot_meta(d)
    assert set(meta["stats"]) == set(meta["files"])  # carried + rewritten
    # keys ≥ 350 live only in carried files; pruning must still drop most
    kept, pruned = S.prune_files(d, [("k", ">=", 350)])
    assert pruned and len(kept) < len(meta["files"])
    got = S.read_table(spark, d, where=[("k", ">=", 350)])
    assert got.count() == 50
    # and the merged row reads back through an unpruned residual filter
    assert S.read_table(spark, d, where=[("k", "=", 5)]).collect()[0].val == -1.0


def test_prune_rejects_bad_predicates(spark, tmp_path):
    d = str(tmp_path / "tbl")
    S.write_snapshot(_ranged(spark, n=10, buckets=1), d, mode="overwrite")
    with pytest.raises(ValueError, match="predicate"):
        S.prune_files(d, [("k", "!=", 3)])


def test_rollback_restores_old_version_as_new_commit(spark, table):
    v1 = S.current_version(table)
    before = _as_dict(S.read_table(spark, table, version=v1))
    S.write_snapshot(_mk(spark, [(10_000, 9, 9.9)]), table, mode="append")
    S.delete_where(spark, table, "k < 10")
    assert _as_dict(S.read_table(spark, table)) != before
    rec = S.rollback_table(table, v1)
    assert rec["operation"] == "rollback"
    assert _as_dict(S.read_table(spark, table)) == before
    # the bad commits remain time-travel readable, history stays linear
    assert 10_000 in _as_dict(S.read_table(spark, table, version=v1 + 1))
    log = S.snapshot_log(table)
    assert [r["version"] for r in log] == list(range(1, len(log) + 1))
    # pruning still works off the restored stats
    kept, pruned = S.prune_files(table, [("k", "=", 3)])
    assert len(kept) <= len(S.snapshot_meta(table)["files"])


def test_rollback_rejects_future_version(spark, table):
    with pytest.raises(ValueError, match="roll back"):
        S.rollback_table(table, S.current_version(table) + 1)

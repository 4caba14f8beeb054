"""Snapshot-versioned parquet tables: time travel + copy-on-write commits.

The north-star input is "an Iceberg table of image+caption pairs"; no
Iceberg runtime jar is obtainable offline (COVERAGE.md), so this module
completes the raw-parquet substitution the runtime layer already started
(resume = `checkpoint.py`, maintenance = `compact.py`, RTBF =
`delete.py`, layout = `layout.py`) with the remaining core Iceberg
semantics, implemented over plain parquet files + JSON metadata:

- **Snapshot isolation / time travel**: every commit writes immutable
  data files under ``data/c{version}/`` and an atomic snapshot JSON
  (``_snapshots/v{version}.json``) listing the table's data files by
  relative path (Iceberg: manifest list). Readers pin a version and read
  exactly those files — a concurrent writer can never tear a read.
- **Atomic commits**: the snapshot JSON and the CURRENT pointer are both
  written temp-then-``os.replace`` (POSIX-atomic). A crash between the
  data write and the snapshot commit leaves only orphan files that
  ``expire_snapshots`` garbage-collects; the table stays readable at the
  previous version (pinned by test).
- **Copy-on-write DELETE / MERGE** (Iceberg ``delete from`` /
  ``MERGE INTO`` with write.delete.mode=copy-on-write): only the data
  files that actually contain affected rows are rewritten; every other
  file is carried into the new snapshot by reference, byte-identical.
- **Manifest-level file pruning** (Iceberg: per-manifest-entry column
  bounds): every commit records per-file min/max/null_count from the
  new files' parquet footers (metadata-only; carried files keep the
  bounds their writing commit recorded — immutable files, bounds exact
  forever). ``read_table(where=[(col, op, lit), ...])`` /
  ``prune_files`` drop files whose bounds prove no match BEFORE Spark
  ever opens a footer — the step that makes a point lookup on a
  10^12-row table O(matching files), not O(all footers).
- **Rollback** (Iceberg ``rollback_to_snapshot``): one atomic metadata
  commit pointing back at an old snapshot's files/schema/stats.

Scale notes (the whole point of file-granular metadata at 10^12 rows):
- Affected-file discovery is ONE Spark job — a semi-join of the target
  against the (distinct, auto-broadcast when small) source keys, grouped
  by ``input_file_name()``. Only the key columns are read (Catalyst
  column pruning reaches the parquet scan), never the image bytes.
- The rewrite job reads ONLY the affected files (`spark.read.parquet`
  on the explicit file list — file-level pruning by construction), so a
  merge touching k keys rewrites O(k) files out of millions.
- The driver handles file LISTS only (metadata scale, same as an
  Iceberg commit); no per-row driver work anywhere.

The reference has no analog — its "table" is a directory of pickle
dumps rewritten wholesale per run (``tpch_utils_knob.py:283,333-351``).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Manifest-reading helpers live in the standalone stdlib-only module so
# the qcfe_snapshot data source can be pickled by value (manifest.py
# docstring has the full why); re-exported here to keep this module's
# public surface unchanged.
from query_cost_feature_engineering_spark.runtime.manifest import (  # noqa: F401
    SNAP_DIR,
    _cmp_compatible,
    _file_may_match,
    _snap_path,
    _stat_val,
    current_version,
    snapshot_meta,
)

_FILE_COL = "__qcfe_file"

# predicate ops read_table(where=...) / prune_files understand; AND-combined
_PRUNE_OPS = ("=", "<", "<=", ">", ">=")


def snapshot_log(table_dir: str) -> list[dict]:
    """Commit history, oldest first (Iceberg: table history metadata)."""
    sdir = _snap_path(table_dir)
    if not sdir.is_dir():
        return []
    out = []
    for p in sorted(sdir.glob("v*.json")):
        rec = json.loads(p.read_text())
        out.append(
            {
                "version": rec["version"],
                "parent": rec["parent"],
                "operation": rec["operation"],
                "n_files": len(rec["files"]),
                "summary": rec.get("summary", {}),
            }
        )
    return out


def _commit(table_dir: str, rec: dict) -> None:
    """Atomically publish snapshot JSON, then flip CURRENT.

    Order matters: the snapshot file must be durable before CURRENT
    points at it; a crash between the two leaves CURRENT at the parent
    (consistent) with one unreferenced-but-valid snapshot JSON, which the
    next commit simply supersedes."""
    sdir = _snap_path(table_dir)
    sdir.mkdir(parents=True, exist_ok=True)
    final = sdir / f"v{rec['version']:06d}.json"
    tmp = sdir / f".v{rec['version']:06d}.json.tmp"
    tmp.write_text(json.dumps(rec, sort_keys=True))
    os.replace(tmp, final)
    cur_tmp = sdir / ".CURRENT.tmp"
    cur_tmp.write_text(str(rec["version"]))
    os.replace(cur_tmp, sdir / "CURRENT")


def _data_files(table_dir: str, version: int | None = None) -> list[str]:
    """Absolute paths of the snapshot's data files."""
    meta = snapshot_meta(table_dir, version)
    root = Path(table_dir)
    return [str(root / rel) for rel in meta["files"]]


def _collect_stats(
    table_dir: str, rel_files: list[str], stats_cols: list[str] | None
) -> dict:
    """Per-file column min/max/null_count from the parquet FOOTERS of
    freshly written files — metadata-only reads, no data pages touched
    (Iceberg writers report the same bounds into the manifest at commit;
    on a cluster the footer read runs where the commit runs, over the
    files THIS commit added — O(new files), never O(table)).

    Only stats-able primitive types are recorded (int/float/bool/string/
    date/timestamp); binary payloads (the image ``bytes`` column) and
    nested types are skipped. A column whose footer lacks min/max in any
    row group is omitted for that file — pruning then keeps the file
    (conservative). parquet-mr may truncate long binary bounds, but its
    truncation keeps them valid (min prefix-truncated down, max
    incremented up), so pruning on them stays correct."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    root = Path(table_dir)
    out: dict[str, dict] = {}
    for rel in rel_files:
        pf = pq.ParquetFile(str(root / rel))
        arrow_schema = pf.schema_arrow
        eligible = []
        for field in arrow_schema:
            t = field.type
            if stats_cols is not None and field.name not in stats_cols:
                continue
            if (
                pat.is_integer(t)
                or pat.is_floating(t)
                or pat.is_boolean(t)
                or pat.is_string(t)
                or pat.is_large_string(t)
                or pat.is_date(t)
                or pat.is_timestamp(t)
            ):
                eligible.append(field.name)
        md = pf.metadata
        if md.num_row_groups == 0:
            out[rel] = {}
            continue
        # leaf-column index by path (top-level primitives: path == name)
        rg0 = md.row_group(0)
        col_idx = {
            rg0.column(i).path_in_schema: i for i in range(rg0.num_columns)
        }
        fstats: dict[str, dict] = {}
        for name in eligible:
            ci = col_idx.get(name)
            if ci is None:
                continue
            mins, maxs = [], []
            nulls: int | None = 0
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mins.append(st.min)
                maxs.append(st.max)
                if nulls is not None and st.has_null_count:
                    nulls += st.null_count
                else:
                    nulls = None
            if not ok:
                continue
            lo, hi = _stat_val(min(mins)), _stat_val(max(maxs))
            if lo is None or hi is None:
                continue
            fstats[name] = {
                "min": lo,
                "max": hi,
                "null_count": nulls,
                "num_rows": md.num_rows,
            }
        out[rel] = fstats
    return out


def _commit_stats(
    table_dir: str,
    parent_meta: dict | None,
    keep_files: list[str],
    new_files: list[str],
    stats_cols: list[str] | None = None,
) -> dict:
    """Stats map for a new snapshot: carried files keep the bounds their
    writing commit recorded (the files are immutable, so the bounds stay
    exact forever); new files get fresh footer stats."""
    carried = {}
    if parent_meta is not None:
        parent_stats = parent_meta.get("stats", {})
        carried = {f: parent_stats[f] for f in keep_files if f in parent_stats}
    return carried | _collect_stats(table_dir, new_files, stats_cols)


def prune_files(
    table_dir: str,
    predicates: list[tuple],
    version: int | None = None,
) -> tuple[list[str], list[str]]:
    """Split the snapshot's file list into (kept, pruned) under the
    AND-combined ``(column, op, literal)`` predicates using ONLY the
    manifest's per-file min/max — pure driver-side metadata, no file is
    opened (Iceberg's manifest-entry bounds pruning: the step that turns
    a point lookup on a 10^12-row table from "open every footer" into
    "read the k files whose range covers the key")."""
    for p in predicates:
        if len(p) != 3 or p[1] not in _PRUNE_OPS:
            raise ValueError(
                f"predicate must be (column, op, literal) with op in "
                f"{_PRUNE_OPS}, got {p!r}"
            )
    meta = snapshot_meta(table_dir, version)
    stats = meta.get("stats", {})
    kept, pruned = [], []
    for f in meta["files"]:
        (kept if _file_may_match(stats.get(f, {}), predicates) else pruned).append(f)
    return kept, pruned


def read_table(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Read the table as of ``version`` (default: latest) — time travel.

    Reads exactly the files the snapshot lists; files added by later
    commits are invisible, files logically deleted later are still
    readable (until ``expire_snapshots`` physically removes them).

    ``where``: optional list of ``(column, op, literal)`` with op in
    ``=,<,<=,>,>=`` (AND semantics). The file list is first pruned
    driver-side against the manifest's per-file min/max (see
    ``prune_files``), then the SAME predicates are applied as residual
    Spark filters — so results are exact regardless of how much the
    stats could prune, and parquet row-group pruning still applies
    within the kept files."""
    meta = snapshot_meta(table_dir, version)
    schema = StructType.fromJson(json.loads(meta["schema"]))
    if where:
        kept, _ = prune_files(table_dir, where, version)
        files = [str(Path(table_dir) / f) for f in kept]
    else:
        files = _data_files(table_dir, version)
    if not files:
        return spark.createDataFrame([], schema)
    # read under the SNAPSHOT's schema, not a sampled footer: after an
    # additive schema evolution, files from older commits simply lack the
    # new columns and surface them as nulls — no mergeSchema footer sweep
    # (which reads every footer at planning time) needed
    df = spark.read.schema(schema).parquet(*files)
    for col, op, val in where or []:
        c = F.col(col)
        df = df.filter(
            {
                "=": c == F.lit(val),
                "<": c < F.lit(val),
                "<=": c <= F.lit(val),
                ">": c > F.lit(val),
                ">=": c >= F.lit(val),
            }[op]
        )
    return df


def _write_data(df: DataFrame, table_dir: str, version: int) -> list[str]:
    """Write df's rows as immutable files under data/c{version}; returns
    their table-relative paths. An interrupted write leaves only orphans
    in a directory no snapshot references."""
    rel_dir = f"data/c{version:06d}"
    out = Path(table_dir) / rel_dir
    if out.exists():  # leftover from a crashed attempt at this version
        shutil.rmtree(out)
    df.write.mode("overwrite").parquet(str(out))
    return sorted(
        f"{rel_dir}/{p.name}" for p in out.glob("*.parquet")
    )


def _txn_map(table_dir: str, parent: int) -> dict:
    if not parent:
        return {}
    return dict(snapshot_meta(table_dir, parent).get("stream_txn", {}))


def txn_version(table_dir: str, app_id: str) -> int:
    """Last transaction id committed for ``app_id``, -1 if none — the
    Delta ``txnAppId``/``txnVersion`` idempotence handle: a streaming
    writer replaying micro-batch b after a crash checks
    ``b <= txn_version(...)`` and skips the duplicate commit."""
    if current_version(table_dir) == 0:
        return -1
    return int(_txn_map(table_dir, current_version(table_dir)).get(app_id, -1))


def _evolve_schema(parent_schema_json: str, df: DataFrame) -> str:
    """Additive schema evolution for appends: the snapshot schema is the
    parent's fields (types must match where the new data has them) plus
    any NEW fields the appended data introduces, in order. Old files
    never rewrite — ``read_table`` surfaces their missing columns as
    nulls. Type changes and renames are rejected loudly (they would
    silently corrupt old data under a positional parquet read)."""
    parent = StructType.fromJson(json.loads(parent_schema_json))
    new_by_name = {f.name: f for f in df.schema.fields}
    for f in parent.fields:
        g = new_by_name.get(f.name)
        if g is not None and g.dataType != f.dataType:
            raise ValueError(
                f"schema evolution is additive-only: column {f.name!r} "
                f"changed type {f.dataType} -> {g.dataType}"
            )
    known = {f.name for f in parent.fields}
    merged = list(parent.fields) + [
        f for f in df.schema.fields if f.name not in known
    ]
    return StructType(merged).json()


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    txn: tuple[str, int] | None = None,
) -> dict:
    """Commit ``df`` as a new snapshot. ``mode='append'`` keeps the
    parent's files and adds new ones; ``'overwrite'`` starts the file
    list fresh (parent data stays readable via time travel). ``txn=
    (app_id, version)`` stamps a writer transaction for idempotent
    streaming commits (see ``txn_version``)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent = current_version(table_dir)
    version = parent + 1
    schema_json = df.schema.json()
    if mode == "append" and parent:
        schema_json = _evolve_schema(
            snapshot_meta(table_dir, parent)["schema"], df
        )
    new_files = _write_data(df, table_dir, version)
    parent_meta = snapshot_meta(table_dir, parent) if parent else None
    prev = parent_meta["files"] if parent_meta else []
    keep = prev if mode == "append" else []
    files = keep + new_files
    rec = {
        "version": version,
        "parent": parent,
        "operation": mode,
        "files": sorted(files),
        "schema": schema_json,
        "stats": _commit_stats(table_dir, parent_meta, keep, new_files),
        "summary": {"files_added": len(new_files)},
        "stream_txn": _txn_map(table_dir, parent)
        | (dict([txn]) if txn else {}),
    }
    _commit(table_dir, rec)
    return rec


def _affected_files(
    tgt: DataFrame, probe: DataFrame, on: list[str]
) -> list[str]:
    """Files containing at least one row matching ``probe`` on ``on``.

    One job; only the key columns + input_file_name are read (the scan's
    ReadSchema excludes payload columns); the probe side is distinct-ed
    and small (matched keys), so AQE broadcasts it."""
    hits = (
        tgt.select(*on, F.input_file_name().alias(_FILE_COL))
        .join(probe.select(*on).distinct(), on=on, how="leftsemi")
        .select(_FILE_COL)
        .distinct()
        .collect()
    )
    return sorted(r[_FILE_COL] for r in hits)


def _norm_file_uri(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _rel_to_table(table_dir: str, abs_paths: list[str]) -> set[str]:
    root = str(Path(table_dir).resolve())
    out = set()
    for p in abs_paths:
        rp = str(Path(_norm_file_uri(p)).resolve())
        out.add(os.path.relpath(rp, root))
    return out


def delete_where(
    spark: SparkSession, table_dir: str, predicate: str
) -> dict:
    """Copy-on-write DELETE: rewrite only the files that contain rows
    matching ``predicate`` (SQL expression); carry every other file into
    the new snapshot untouched (byte-identical — pinned by test)."""
    parent = current_version(table_dir)
    meta = snapshot_meta(table_dir, parent)
    files = _data_files(table_dir, parent)
    tgt = spark.read.parquet(*files)
    cond = F.expr(predicate)
    affected_abs = sorted(
        r[_FILE_COL]
        for r in tgt.filter(cond)
        .select(F.input_file_name().alias(_FILE_COL))
        .distinct()
        .collect()
    )
    if not affected_abs:
        return {"version": parent, "files_rewritten": 0, "rows_deleted": 0}
    affected_rel = _rel_to_table(table_dir, affected_abs)
    keep_files = [f for f in meta["files"] if f not in affected_rel]

    aff = spark.read.parquet(*[_norm_file_uri(p) for p in affected_abs])
    n_before = aff.count()
    survivors = aff.filter(~cond)
    version = parent + 1
    new_files = _write_data(survivors, table_dir, version)
    n_after = read_n_rows(spark, table_dir, version_files=new_files)
    rec = {
        "version": version,
        "parent": parent,
        "operation": "delete",
        "files": sorted(keep_files + new_files),
        "schema": meta["schema"],
        "stats": _commit_stats(table_dir, meta, keep_files, new_files),
        "summary": {
            "files_rewritten": len(affected_rel),
            "rows_deleted": int(n_before - n_after),
            "predicate": predicate,
        },
        # carry writer-txn state so a maintenance delete between stream
        # batches doesn't reset streaming idempotence
        "stream_txn": _txn_map(table_dir, parent),
    }
    _commit(table_dir, rec)
    return rec["summary"] | {"version": version}


def read_n_rows(
    spark: SparkSession, table_dir: str, version_files: list[str]
) -> int:
    if not version_files:
        return 0
    root = Path(table_dir)
    return spark.read.parquet(
        *[str(root / f) for f in version_files]
    ).count()


def merge_into(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    on: list[str],
    validate_source_keys: bool = True,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Copy-on-write MERGE INTO (upsert): WHEN MATCHED update all
    columns from source, WHEN NOT MATCHED insert the source row.

    Plan shape: (1) discovery — semi-join target keys × distinct source
    keys grouped by file (key columns only, broadcast probe); (2)
    rewrite — LEFT join of ONLY the affected files against the source,
    matched rows take every source column (including legitimate NULLs —
    a presence flag, not ``coalesce``, decides); (3) inserts — source
    anti-joined against the FULL target's key projection. (2)+(3) are
    unioned into one write. Unaffected files carry over by reference.

    Iceberg MERGE rejects a source row matching twice; ``validate_source
    _keys`` enforces the same contract with one aggregate."""
    parent = current_version(table_dir)
    meta = snapshot_meta(table_dir, parent)
    files = _data_files(table_dir, parent)
    tgt = spark.read.parquet(*files)
    cols = tgt.columns
    if sorted(source.columns) != sorted(cols):
        raise ValueError(
            f"source columns {sorted(source.columns)} != table {sorted(cols)}"
        )
    if validate_source_keys:
        dups = (
            source.groupBy(*on)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dups:
            raise ValueError("MERGE source has duplicate keys on " + str(on))

    affected_abs = _affected_files(tgt, source, on)
    affected_rel = _rel_to_table(table_dir, affected_abs)
    keep_files = [f for f in meta["files"] if f not in affected_rel]

    src = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in cols], F.lit(True).alias("__m")
    )
    join_cond = [F.col(k) == F.col(f"__s_{k}") for k in on]
    if affected_abs:
        aff = spark.read.parquet(*[_norm_file_uri(p) for p in affected_abs])
        updated = aff.join(F.broadcast(src), join_cond, "left").select(
            *[
                F.when(F.col("__m"), F.col(f"__s_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in cols
            ]
        )
    else:
        updated = None
    inserts = source.join(
        tgt.select(*on), on=on, how="left_anti"
    ).select(*cols)
    out = inserts if updated is None else updated.unionByName(inserts)

    version = parent + 1
    new_files = _write_data(out, table_dir, version)
    rec = {
        "version": version,
        "parent": parent,
        "operation": "merge",
        "files": sorted(keep_files + new_files),
        "schema": meta["schema"],
        "stats": _commit_stats(table_dir, meta, keep_files, new_files),
        "summary": {
            "files_rewritten": len(affected_rel),
            "files_carried": len(keep_files),
        },
        "stream_txn": _txn_map(table_dir, parent)
        | (dict([txn]) if txn else {}),
    }
    _commit(table_dir, rec)
    return rec["summary"] | {"version": version}


def read_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows added between two snapshots (Iceberg incremental scan — the
    feed for downstream incremental consumers).

    Fast path: when every commit in (from, to] is an ``append``, the
    changes are EXACTLY the files those commits added — the scan reads
    only them, never the base table (O(delta), the 10^12-row contract;
    pinned via inputFiles in tests). When a rewrite commit (merge /
    delete / overwrite) intervenes, added files also carry rows copied
    from rewritten files, so the fast path over-reports; this falls back
    to the exact row-level diff ``to EXCEPT ALL from`` — one shuffle over
    both versions, correct for any history. Callers needing O(delta)
    merge feeds should consume per-commit (``from = to - 1``) right
    after each merge, or use the CDC stream itself."""
    to_v = current_version(table_dir) if to_version is None else to_version
    if to_v < from_version:
        raise ValueError(f"to_version {to_v} < from_version {from_version}")
    if to_v == from_version:
        meta = snapshot_meta(table_dir, to_v)
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(meta["schema"]))
        )
    ops = [
        snapshot_meta(table_dir, v)["operation"]
        for v in range(from_version + 1, to_v + 1)
    ]
    if all(op == "append" for op in ops):
        base = set(snapshot_meta(table_dir, from_version)["files"])
        added = [
            f
            for f in snapshot_meta(table_dir, to_v)["files"]
            if f not in base
        ]
        if not added:
            meta = snapshot_meta(table_dir, to_v)
            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(meta["schema"]))
            )
        root = Path(table_dir)
        return spark.read.parquet(*[str(root / f) for f in added])
    return read_table(spark, table_dir, to_v).exceptAll(
        read_table(spark, table_dir, from_version)
    )


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite the current snapshot's files into ~``target_bytes`` files
    as a NEW snapshot (Iceberg ``rewrite_data_files``): rows are
    untouched (verified by count before commit), history stays readable,
    and incremental consumers see zero changes across the compaction
    (``read_changes`` takes the exact-diff path and returns empty —
    pinned by test). Unlike `runtime/compact.py` (in-place dir swap for
    plain parquet dirs), nothing is moved or deleted here — old files
    fall out via ``expire_snapshots``."""
    parent = current_version(table_dir)
    meta = snapshot_meta(table_dir, parent)
    root = Path(table_dir)
    files = _data_files(table_dir, parent)
    total = sum(Path(f).stat().st_size for f in files)
    df = read_table(spark, table_dir, parent)
    n_rows = df.count()
    n_out = max(int(total / target_bytes), 1)
    version = parent + 1
    new_files = _write_data(df.repartition(n_out), table_dir, version)
    n_new = spark.read.parquet(
        *[str(root / f) for f in new_files]
    ).count()
    if n_new != n_rows:
        raise RuntimeError(f"compaction row mismatch: {n_rows} -> {n_new}")
    rec = {
        "version": version,
        "parent": parent,
        "operation": "compact",
        "files": sorted(new_files),
        "schema": meta["schema"],
        "stats": _commit_stats(table_dir, None, [], new_files),
        "summary": {
            "files_before": len(files),
            "files_after": len(new_files),
            "rows": int(n_rows),
        },
        "stream_txn": _txn_map(table_dir, parent),
    }
    _commit(table_dir, rec)
    return rec["summary"] | {"version": version}


def rollback_table(table_dir: str, version: int) -> dict:
    """Roll the table back to ``version`` (Iceberg
    ``rollback_to_snapshot``): a NEW commit whose file list, schema, and
    stats are exactly the target snapshot's — nothing is copied or
    deleted, history stays linear (the bad commits remain time-travel-
    readable until ``expire_snapshots``), and the rollback itself is
    one atomic metadata write. Streaming-writer txn state carries from
    the CURRENT version, not the target: a rolled-back table must still
    reject replays of micro-batches it has already absorbed."""
    cur = current_version(table_dir)
    if version > cur or version < 1:
        raise ValueError(f"cannot roll back to v{version} (current {cur})")
    tgt = snapshot_meta(table_dir, version)
    rec = {
        "version": cur + 1,
        "parent": cur,
        "operation": "rollback",
        "files": tgt["files"],
        "schema": tgt["schema"],
        "stats": tgt.get("stats", {}),
        "summary": {"rolled_back_to": version},
        "stream_txn": _txn_map(table_dir, cur),
    }
    _commit(table_dir, rec)
    return rec


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and physically
    delete data files no surviving snapshot references (Iceberg:
    ``expire_snapshots`` + orphan-file cleanup). Also removes crash
    orphans — data dirs never referenced by any snapshot."""
    cur = current_version(table_dir)
    keep_versions = set(range(max(cur - keep_last + 1, 1), cur + 1))
    sdir = _snap_path(table_dir)
    referenced: set[str] = set()
    dropped_snaps = []
    for p in sorted(sdir.glob("v*.json")):
        v = int(p.stem[1:])
        if v in keep_versions:
            referenced |= set(json.loads(p.read_text())["files"])
        else:
            p.unlink()
            dropped_snaps.append(v)
    root = Path(table_dir)
    removed_files = 0
    for f in sorted((root / "data").rglob("*.parquet")):
        if str(f.relative_to(root)) not in referenced:
            f.unlink()
            removed_files += 1
    for d in sorted((root / "data").glob("c*")):
        if d.is_dir() and not any(d.iterdir()):
            d.rmdir()
    return {
        "snapshots_dropped": dropped_snaps,
        "data_files_removed": removed_files,
    }

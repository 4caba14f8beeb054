"""Streaming layer vs batch semantics: every emitted streaming session must
match the batch sessionizer's rollup exactly, and every session safely past
the watermark must be emitted (append mode finalization)."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
import pytest

from query_cost_feature_engineering_spark.operators.windows import (
    with_session_ids,
)
from query_cost_feature_engineering_spark.streaming.sessions import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    tumbling_counts_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP_S = 1800
WM_S = 7200


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """The streaming file source needs a DIRECTORY of files; the testdata
    table is a single parquet file — stage it into a dir."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS, d / "part-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_sessions(spark):
    e = spark.read.parquet(EVENTS)
    s = with_session_ids(e, entity_col="user_id", ts_col="ts", gap_s=GAP_S,
                         tiebreak="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
    )


def test_stream_sessions_match_batch(spark, batch_sessions, events_dir):
    stream = read_events_stream(spark, events_dir)
    out = run_stream_to_memory(
        sessionize_stream(stream, gap_s=GAP_S, watermark=f"{WM_S} seconds")
    ).toPandas()
    assert len(out) > 0

    batch = batch_sessions.set_index(["user_id", "first_ts"])
    # 1) everything emitted matches a batch session exactly
    for row in out.itertuples():
        key = (row.user_id, row.session_start)
        assert key in batch.index, f"streaming session {key} unknown to batch"
        b = batch.loc[key]
        assert row.n_events == b["n_events"]
        assert abs(row.sum_value - b["sum_value"]) < 1e-9
        assert row.last_ts == b["last_ts"]

    # 2) sessions comfortably older than the watermark are all emitted
    max_ts = spark.read.parquet(EVENTS).agg(F.max("ts")).collect()[0][0]
    emitted = {(r.user_id, r.session_start) for r in out.itertuples()}
    import pandas as pd

    cutoff = max_ts - pd.Timedelta(seconds=WM_S + GAP_S + 60)
    must_emit = batch_sessions[batch_sessions["last_ts"] < cutoff]
    missing = [
        (r.user_id, r.first_ts)
        for r in must_emit.itertuples()
        if (r.user_id, r.first_ts) not in emitted
    ]
    assert not missing, f"finalized sessions not emitted: {missing[:5]}"


def test_watermark_boundary_exact(spark, tmp_path):
    """Pin Spark's append-mode eviction predicate: a session whose end
    (last_ts + gap) lands EXACTLY on the watermark (max event time - delay)
    IS emitted (end <= watermark), one second later is NOT. Both oracles in
    oracles.py use this `<=` boundary."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00")
    m = base + pd.Timedelta(hours=10)
    rows = [
        # end = (m-9000s) + 1800s == m - 7200s == watermark: must emit
        (1, m - pd.Timedelta(seconds=9000), 10, "click", 1.0, "{}"),
        # end = watermark - 1s: must emit
        (2, m - pd.Timedelta(seconds=9001), 20, "click", 1.0, "{}"),
        # end = watermark + 1s: must NOT emit
        (3, m - pd.Timedelta(seconds=8999), 30, "click", 1.0, "{}"),
        (4, m, 40, "click", 1.0, "{}"),  # carries the max event time
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path / "wm_probe")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(d)
    out = run_stream_to_memory(
        sessionize_stream(
            read_events_stream(spark, d), gap_s=GAP_S, watermark=f"{WM_S} seconds"
        )
    ).toPandas()
    emitted = set(out["user_id"].tolist())
    assert 10 in emitted, "session ending exactly at watermark must be emitted"
    assert 20 in emitted
    assert 30 not in emitted
    assert 40 not in emitted


def test_stream_tumbling_counts_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    out = run_stream_to_memory(
        tumbling_counts_stream(stream, window="1 day", watermark="2 hours")
    ).toPandas()
    assert len(out) > 0
    batch = (
        spark.read.parquet(EVENTS)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .toPandas()
        .set_index(["day", "event_type"])
    )
    for row in out.itertuples():
        b = batch.loc[(row.day, row.event_type)]
        assert row.n_events == b["n_events"]
        assert abs(row.sum_value - b["sum_value"]) < 1e-6


def test_stateful_user_stats_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState must FOLD state across micro-batches: two
    files with maxFilesPerTrigger=1 force two batches; the last emission
    per user must equal the batch aggregate over BOTH files."""
    import shutil

    from query_cost_feature_engineering_spark.streaming.sessions import (
        stateful_user_stats_stream,
    )

    e = spark.read.parquet(EVENTS)
    half_a = e.filter(F.col("event_id") % 2 == 0)
    half_b = e.filter(F.col("event_id") % 2 == 1)
    d = str(tmp_path / "two_batches")
    half_a.coalesce(1).write.parquet(f"{d}/stage_a")
    half_b.coalesce(1).write.parquet(f"{d}/stage_b")
    src = tmp_path / "src"
    src.mkdir()
    import glob

    for i, stage in enumerate(("stage_a", "stage_b")):
        f = glob.glob(f"{d}/{stage}/part-*.parquet")[0]
        shutil.copy(f, src / f"part-{i:03d}.parquet")

    stream = read_events_stream(spark, str(src), max_files=1)
    out = run_stream_to_memory(
        stateful_user_stats_stream(stream), mode="update"
    ).toPandas()
    # update mode: users touched in both batches emit twice; the LAST
    # emission (max n_events) carries the folded state
    final = out.sort_values("n_events").groupby("user_id").tail(1)
    batch = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    multi_emit = len(out) > len(batch)
    assert multi_emit, "two batches should produce >1 emission for some user"
    for row in final.itertuples():
        b = batch.loc[row.user_id]
        assert row.n_events == b["n_events"]
        assert abs(row.sum_value - b["sum_value"]) < 1e-6
        assert row.last_ts == b["last_ts"]


def test_stream_interval_join_matches_batch_across_batches(spark, tmp_path):
    """Stream-stream interval join with the input split into 4 files and
    maxFilesPerTrigger=1 — matches land across microbatch boundaries, so
    the join state (and its watermark eviction) is genuinely exercised.
    Emitted pair set must equal the batch theta-join."""
    from query_cost_feature_engineering_spark.streaming.sessions import (
        attribute_purchases_stream,
    )

    e = spark.read.parquet(EVENTS)
    d = tmp_path / "ij_parts"
    d.mkdir()
    # split into time quartiles: files arrive in event-time order (the
    # realistic arrival pattern), so nothing falls behind the 2h
    # watermark, while 1h-lookback matches still span file boundaries —
    # the cross-batch join state is what satisfies them
    e2 = e.withColumn(
        "_q",
        F.ntile(4).over(
            __import__("pyspark").sql.Window.orderBy("ts", "event_id")
        ),
    )
    for i in range(1, 5):
        e2.filter(F.col("_q") == i).drop("_q").coalesce(1).write.parquet(
            str(d / f"stripe={i}")
        )
    stream = lambda: (  # noqa: E731
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(d))
    )
    out = run_stream_to_memory(
        attribute_purchases_stream(
            stream().filter(F.col("event_type") == "click"),
            stream().filter(F.col("event_type") == "purchase"),
        )
    )
    got = {
        (r.purchase_id, r.click_id)
        for r in out.select("purchase_id", "click_id").collect()
    }
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & F.col("cts").between(
                F.col("pts") - F.expr("INTERVAL 1 HOUR"), F.col("pts")
            ),
        ).collect()
    }
    assert want, "fixture must produce at least one attributed pair"
    assert got == want


def test_stream_image_features_matches_batch(spark, tmp_path):
    """The streamed featurize stage is stateless, so its rows must be
    bitwise-identical to the batch operator chain over the same files."""
    from query_cost_feature_engineering_spark.sources.images import (
        generate_images_pandas,
    )
    from query_cost_feature_engineering_spark.streaming.images import (
        image_features_stream,
        read_images_stream,
    )

    d = str(tmp_path / "imgs")
    spark.createDataFrame(generate_images_pandas(300, 20, 7)).repartition(
        3
    ).write.parquet(d)

    got = run_stream_to_memory(
        image_features_stream(read_images_stream(spark, d, max_files=1))
    )
    want = image_features_stream(spark.read.parquet(d))
    assert got.columns == want.columns
    assert "bytes" not in got.columns and "caption" not in got.columns

    cols = sorted(got.columns)
    key = lambda rows: sorted(tuple(r[c] for c in cols) for r in rows)
    assert key(got.collect()) == key(want.collect())


def test_feature_store_sink_incremental_and_idempotent(spark, tmp_path):
    """foreachBatch feature-store sink: (1) content equals the batch
    featurize of the same files, (2) a re-run with the same checkpoint
    and no new input writes nothing, (3) new input files produce only
    new batches and the store converges to the full batch result."""
    from query_cost_feature_engineering_spark.sources.images import (
        generate_images_pandas,
    )
    from query_cost_feature_engineering_spark.streaming.images import (
        image_features_stream,
        read_feature_store,
        read_images_stream,
        stream_to_feature_store,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    pdf = generate_images_pandas(200, 15, 11)
    spark.createDataFrame(pdf.iloc[:120]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain():
        stream_to_feature_store(
            image_features_stream(read_images_stream(spark, src, max_files=1)),
            store, ckpt,
        )

    def store_ids():
        return sorted(
            r.image_id for r in read_feature_store(spark, store).collect()
        )

    drain()
    first = store_ids()
    assert first == sorted(pdf.iloc[:120]["image_id"])

    import glob

    batches_before = set(glob.glob(f"{store}/batch=*"))
    drain()  # no new input: no new batch dirs, no new rows
    assert set(glob.glob(f"{store}/batch=*")) == batches_before
    assert store_ids() == first

    spark.createDataFrame(pdf.iloc[120:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()  # only the new file becomes a new batch
    assert set(glob.glob(f"{store}/batch=*")) > batches_before
    assert store_ids() == sorted(pdf["image_id"])

    # store content matches the batch chain row-for-row
    want = image_features_stream(spark.read.parquet(src))
    got = read_feature_store(spark, store)
    cols = sorted(want.columns)
    key = lambda rows: sorted(tuple(r[c] for c in cols) for r in rows)
    assert key(got.collect()) == key(want.collect())


def test_feature_store_additive_schema_evolution(spark, tmp_path):
    """A pipeline that starts emitting a new feature column must keep old
    batches readable: the upgraded chain reuses the SAME checkpoint (batch
    ids continue, history untouched), and mergeSchema surfaces the new
    column as null for old batches — no old file rewritten."""
    from query_cost_feature_engineering_spark.sources.images import (
        generate_images_pandas,
    )
    from query_cost_feature_engineering_spark.streaming.images import (
        image_features_stream,
        read_feature_store,
        read_images_stream,
        stream_to_feature_store,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    pdf = generate_images_pandas(120, 10, 13)
    spark.createDataFrame(pdf.iloc[:60]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream_to_feature_store(
        image_features_stream(read_images_stream(spark, src, max_files=1)),
        store, ckpt,
    )

    import glob

    old_files = {
        f: Path(f).stat().st_mtime
        for f in glob.glob(f"{store}/batch=*/*.parquet")
    }

    # v2 of the pipeline adds a feature column; SAME source + SAME
    # checkpoint means only the new input files flow through the upgraded
    # chain and batch ids continue past the committed ones
    spark.createDataFrame(pdf.iloc[60:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    v2 = image_features_stream(
        read_images_stream(spark, src, max_files=1)
    ).withColumn("quality", F.lit(1.0))
    stream_to_feature_store(v2, store, ckpt)

    now = {
        f: Path(f).stat().st_mtime
        for f in glob.glob(f"{store}/batch=*/*.parquet")
    }
    assert set(now) > set(old_files)
    for f, m in old_files.items():
        assert now[f] == m, f"v1 history rewritten: {f}"

    merged = read_feature_store(spark, store, merge_schema=True)
    assert "quality" in merged.columns
    assert merged.count() == 120
    assert merged.filter(F.col("quality").isNull()).count() == 60


# ---------------------------------------------------------------------------
# CDC stream -> snapshot-table upsert (streaming/upsert.py)
# ---------------------------------------------------------------------------


def _cdc_batch(spark, rows):
    return spark.createDataFrame(rows, ["k", "seq", "val"])


def test_stream_upsert_converges_to_latest_per_key(spark, tmp_path):
    """Three CDC files drained one per micro-batch must leave the table
    at exactly the highest-seq row per key, equal to the batch answer."""
    from query_cost_feature_engineering_spark.runtime import snapshots as S
    from query_cost_feature_engineering_spark.streaming.upsert import (
        latest_per_key,
        stream_upsert_to_table,
    )

    src = tmp_path / "cdc_src"
    src.mkdir()
    batches = [
        [(1, 1, "a1"), (2, 2, "b1"), (2, 1, "stale")],  # intra-batch dup key
        [(1, 3, "a2"), (3, 4, "c1")],
        [(2, 5, "b2")],
    ]
    for i, rows in enumerate(batches):
        _cdc_batch(spark, rows).coalesce(1).write.parquet(str(src / f"f{i}"))

    table = str(tmp_path / "tbl")
    changes = (
        spark.readStream.schema("k bigint, seq bigint, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    stream_upsert_to_table(
        changes, table, str(tmp_path / "ck"), on=["k"], seq_col="seq"
    )
    got = {r.k: (r.seq, r.val) for r in S.read_table(spark, table).collect()}
    all_rows = _cdc_batch(spark, [r for b in batches for r in b])
    want = {
        r.k: (r.seq, r.val)
        for r in latest_per_key(all_rows, ["k"], "seq").collect()
    }
    assert got == want == {1: (3, "a2"), 2: (5, "b2"), 3: (4, "c1")}
    # multiple snapshots committed (one per non-empty micro-batch)
    assert S.current_version(table) >= 2


def test_stream_upsert_replay_is_idempotent(spark, tmp_path):
    """A crash-replayed micro-batch (same batch_id) must be skipped: the
    table version and contents do not change."""
    from query_cost_feature_engineering_spark.runtime import snapshots as S
    from query_cost_feature_engineering_spark.streaming.upsert import (
        apply_cdc_batch,
    )

    table = str(tmp_path / "tbl")
    b0 = _cdc_batch(spark, [(1, 1, "a"), (2, 1, "b")])
    b1 = _cdc_batch(spark, [(1, 2, "a2")])
    assert apply_cdc_batch(spark, b0, 0, table, ["k"], "seq", "app") == "bootstrap"
    assert apply_cdc_batch(spark, b1, 1, table, ["k"], "seq", "app") == "merged"
    v = S.current_version(table)
    # replay both batches, as a restarted stream would after a lost sink ack
    assert apply_cdc_batch(spark, b0, 0, table, ["k"], "seq", "app") == "skipped"
    assert apply_cdc_batch(spark, b1, 1, table, ["k"], "seq", "app") == "skipped"
    assert S.current_version(table) == v
    got = {r.k: r.val for r in S.read_table(spark, table).collect()}
    assert got == {1: "a2", 2: "b"}
    # a DIFFERENT writer app is not blocked by this app's txn watermark
    b2 = _cdc_batch(spark, [(3, 1, "c")])
    assert apply_cdc_batch(spark, b2, 0, table, ["k"], "seq", "other") == "merged"


def test_stream_upsert_resume_continues_not_reapplies(spark, tmp_path):
    """Restarting the drained stream with the same checkpoint is a no-op;
    adding a new source file processes ONLY that file."""
    from query_cost_feature_engineering_spark.runtime import snapshots as S
    from query_cost_feature_engineering_spark.streaming.upsert import (
        stream_upsert_to_table,
    )

    src = tmp_path / "src"
    src.mkdir()
    _cdc_batch(spark, [(1, 1, "a")]).coalesce(1).write.parquet(str(src / "f0"))

    table = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")

    def drain():
        changes = (
            spark.readStream.schema("k bigint, seq bigint, val string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        stream_upsert_to_table(changes, table, ck, on=["k"], seq_col="seq")

    drain()
    v1 = S.current_version(table)
    drain()  # nothing new: no commit
    assert S.current_version(table) == v1
    _cdc_batch(spark, [(1, 2, "a2")]).coalesce(1).write.parquet(str(src / "f1"))
    drain()
    assert S.current_version(table) == v1 + 1
    got = {r.k: r.val for r in S.read_table(spark, table).collect()}
    assert got == {1: "a2"}


def test_stream_upsert_out_of_order_batches_cannot_regress(spark, tmp_path):
    """A stale change arriving in a LATER micro-batch must not overwrite
    a newer row (the out-of-order CDC guard)."""
    from query_cost_feature_engineering_spark.runtime import snapshots as S
    from query_cost_feature_engineering_spark.streaming.upsert import (
        apply_cdc_batch,
    )

    table = str(tmp_path / "tbl")
    b0 = _cdc_batch(spark, [(1, 5, "newer"), (2, 1, "b")])
    b1 = _cdc_batch(spark, [(1, 3, "stale-late")])          # all stale
    b2 = _cdc_batch(spark, [(1, 4, "still-stale"), (3, 1, "c")])  # mixed
    assert apply_cdc_batch(spark, b0, 0, table, ["k"], "seq", "a") == "bootstrap"
    assert apply_cdc_batch(spark, b1, 1, table, ["k"], "seq", "a") == "stale"
    assert apply_cdc_batch(spark, b2, 2, table, ["k"], "seq", "a") == "merged"
    got = {r.k: (r.seq, r.val) for r in S.read_table(spark, table).collect()}
    assert got == {1: (5, "newer"), 2: (1, "b"), 3: (1, "c")}

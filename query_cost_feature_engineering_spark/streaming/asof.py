"""Streaming backward as-of join: point-in-time enrichment over live streams.

The streaming twin of ``operators/asof`` — the engine's centerpiece
(ref: utils/metric.py builds per-timestamp feature rows batch-wise; the
north-rule contract is the same point-in-time semantics, zero temporal
leakage). Batch as-of answers "the latest update at or before each probe
timestamp" over data at rest; this operator answers it over two UNBOUNDED
streams with bounded state, which neither a stream-static join (static
side can't be a stream) nor a stream-stream interval join (emits ALL
updates in the window, not the latest, and a latest-per-probe aggregate
after a join is a second stateful operator Spark only allows for
time-window aggregates) can express.

Shape: the two streams are unioned into one TAGGED stream (``side`` =
'u' update / 'p' probe — any other value is a watermark-driver sentinel
carrying no data), watermarked, grouped by entity, and folded through
``applyInPandasWithState``:

- **State per entity** (Arrow-typed long/double arrays, no Python
  objects): pending probes (event time > watermark) and the updates
  that can still serve some future probe — every update newer than the
  watermark plus the SINGLE latest update at or before it (a future
  probe has ts > watermark, so older updates are shadowed by that
  latest one and are evicted). State is O(rows inside the watermark
  delay + 1) per entity — bounded for any stream length.
- **Finalization**: a probe is matched and emitted exactly once, when
  the watermark passes its event time — at that point every update
  with ts <= probe ts has either arrived or is late beyond the
  watermark (dropped by Spark before the operator sees it), so the
  match is FINAL: backward as-of with exact-ts matches allowed, null
  columns when no update precedes the probe (left-join semantics,
  identical to ``asof_join_union_window``). Matching is a numpy
  ``searchsorted`` over the sorted update buffer — vectorized, no
  per-row Python.
- **Liveness**: groups with pending probes arm an event-time timeout at
  the earliest pending probe's timestamp, so an entity that stops
  receiving data still flushes its probes when the global watermark
  passes them (Spark invokes timed-out groups with no data).
- **Exactly-once**: append output mode + the streaming checkpoint;
  each probe lives in exactly one state partition and is evicted at
  emission, so a replayed micro-batch re-emits only what the failed
  batch never committed.

Scale: one hash exchange (the groupBy) over the tagged union; state
store partitioned by entity hash; no driver collection; Arrow batches
end to end. Skewed entities land in one state partition — the same
hot-entity caveat as any keyed stateful operator; the batch-side
time-slicing answer (operators/asof) applies when a bounded backfill
is the actual workload.

Draining a BOUNDED corpus deterministically (tests / the driver query):
the file source orders micro-batches by file mtime, and the watermark
only advances between batches, so the caller appends two sentinel
WAVES (one row per entity, ``side='w'``, at ts far beyond the data,
then a second wave later still): wave 1's batch runs with the
watermark already past all real data and wave 2's invocation finalizes
anything the first pass left pending. Production streams don't need
sentinels — watermarks advance with arriving data and timeouts cover
quiet entities.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TAGGED_SCHEMA = (
    "side string, user_id long, ts timestamp, "
    "probe_id long, purchase_value double"
)

# emitted schema: one row per probe, exactly once
_OUT_SCHEMA = (
    "user_id long, probe_id long, purchase_value double, asof_ts timestamp"
)
# state: pending probes + live updates, as parallel long/double arrays
# (µs since epoch for timestamps — Arrow-native, no Python objects)
_STATE_SCHEMA = (
    "p_ts array<long>, p_id array<long>, "
    "u_ts array<long>, u_val array<double>"
)


def _asof_update_fn(key, pdfs, state):
    """The per-entity fold. Pure function of (state, batch rows,
    watermark) — deterministic for any batching of the same rows as
    long as every row arrives within the watermark delay (Spark's own
    late-data contract)."""
    import numpy as np
    import pandas as pd

    if state.exists:
        p_ts, p_id, u_ts, u_val = state.get
        p_ts, p_id = list(p_ts), list(p_id)
        u_ts, u_val = list(u_ts), list(u_val)
    else:
        p_ts, p_id, u_ts, u_val = [], [], [], []

    if not state.hasTimedOut:
        for pdf in pdfs:
            # values → numpy datetime64 (ns in pandas 1, us in pandas 2)
            # → MICROseconds, unit-safe either way; events carry µs
            # precision so a coarser state clock would alias distinct
            # timestamps
            ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
            side = pdf["side"]
            is_u = (side == "u").to_numpy()
            is_p = (side == "p").to_numpy()
            if is_u.any():
                u_ts.extend(int(t) for t in ts_us[is_u])
                u_val.extend(float(v) for v in pdf["purchase_value"][is_u])
            if is_p.any():
                p_ts.extend(int(t) for t in ts_us[is_p])
                p_id.extend(int(i) for i in pdf["probe_id"][is_p])
    else:
        # timed-out invocation: no data, just finalize against the
        # advanced watermark below
        for _ in pdfs:  # pragma: no cover - Spark passes an empty iter
            pass

    # GroupState reports the watermark in ms; state buffers run in µs.
    # p_us <= wm_ms*1000 is the conservative direction: a probe less
    # than 1 ms above the watermark stays pending one more advance.
    wm = state.getCurrentWatermarkMs() * 1000

    # sort the update buffer once per invocation (append + sort beats
    # maintaining order row-wise; buffers are watermark-bounded)
    order = np.argsort(np.asarray(u_ts, dtype="int64"), kind="stable")
    uts = np.asarray(u_ts, dtype="int64")[order]
    uvl = np.asarray(u_val, dtype="float64")[order]

    pts = np.asarray(p_ts, dtype="int64")
    pid = np.asarray(p_id, dtype="int64")
    done = pts <= wm
    out = None
    if done.any():
        n_done = int(done.sum())
        if uts.size:
            # latest update with u_ts <= p_ts: searchsorted(right) - 1
            pos = np.searchsorted(uts, pts[done], side="right") - 1
            matched = pos >= 0
            vals = np.where(matched, uvl[np.clip(pos, 0, None)], np.nan)
            asof = pd.to_datetime(
                pd.Series(uts[np.clip(pos, 0, None)]), unit="us"
            )
            asof[~matched] = pd.NaT
        else:
            vals = np.full(n_done, np.nan)
            asof = pd.Series([pd.NaT] * n_done, dtype="datetime64[ns]")
        out = pd.DataFrame(
            {
                "user_id": np.full(n_done, key[0], dtype="int64"),
                "probe_id": pid[done],
                "purchase_value": vals,
                "asof_ts": asof,
            }
        )

    # evict: pending probes stay; updates keep everything newer than the
    # watermark plus the single latest one at or before it
    keep_p_ts = [int(t) for t in pts[~done]]
    keep_p_id = [int(i) for i in pid[~done]]
    if uts.size:
        lo = max(int(np.searchsorted(uts, wm, side="right")) - 1, 0)
        keep_u_ts = [int(t) for t in uts[lo:]]
        keep_u_val = [float(v) for v in uvl[lo:]]
    else:
        keep_u_ts, keep_u_val = [], []

    if keep_p_ts or keep_u_ts:
        state.update((keep_p_ts, keep_p_id, keep_u_ts, keep_u_val))
        if keep_p_ts:
            # flush quiet entities when the watermark passes their
            # earliest pending probe (timeout API runs in ms and must
            # be strictly above the current watermark)
            state.setTimeoutTimestamp(
                max(min(keep_p_ts) // 1000, wm // 1000 + 1)
            )
    else:
        state.remove()

    if out is not None:
        yield out


def asof_enrich_stream(tagged: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Backward as-of join over a tagged probe/update stream.

    ``tagged`` columns: ``side`` string ('u' update / 'p' probe / other =
    sentinel), ``user_id`` long, ``ts`` timestamp (the event time both
    sides share), ``probe_id`` long (probes only), ``purchase_value``
    double (updates only). Wider update payloads ride along by packing
    into the value column upstream or re-joining on ``probe_id``
    downstream (one equi-join on an already-unique key).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        tagged.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _asof_update_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def drain_bounded_asof(
    spark: SparkSession,
    tagged: DataFrame,
    workdir: str,
    watermark_s: int = 7200,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the streaming as-of over a BOUNDED tagged corpus and return
    the fully-drained result as a batch DataFrame.

    Stages the corpus as four files with strictly increasing mtimes so
    the file source replays it as four time-ordered micro-batches:
    real rows split at the median event time (two batches — exercises
    watermark advance across REAL data; the split is safe because every
    second-half row's event time exceeds the first half's max, so
    nothing is ever late), then the two sentinel waves the module
    docstring describes (one ``side='w'`` row per entity, far beyond
    the data, a second wave later still) so the final watermark passes
    every probe and each entity group is invoked once more to flush.
    """
    from query_cost_feature_engineering_spark.streaming.sessions import (
        run_stream_to_memory,
    )

    os.makedirs(workdir, exist_ok=True)
    # normalize TIMESTAMP_NTZ parquet inputs to TIMESTAMP so the staged
    # files and the stream-reader schema agree (ordering-only use here)
    tagged = tagged.withColumn("ts", F.col("ts").cast("timestamp"))
    bounds = tagged.agg(
        F.max("ts").alias("mx"),
        F.expr("percentile_approx(unix_micros(ts), 0.5)").alias("md"),
    ).collect()[0]
    max_ts, med = bounds["mx"], int(bounds["md"])
    entities = tagged.select("user_id").distinct()

    def wave(tag_ts):
        return entities.select(
            F.lit("w").alias("side"),
            "user_id",
            F.lit(tag_ts).cast("timestamp").alias("ts"),
            F.lit(None).cast("long").alias("probe_id"),
            F.lit(None).cast("double").alias("purchase_value"),
        )

    import datetime as _dt

    w1 = max_ts + _dt.timedelta(seconds=3 * watermark_s)
    w2 = max_ts + _dt.timedelta(seconds=6 * watermark_s)
    parts = [
        tagged.filter(F.unix_micros("ts") <= med),
        tagged.filter(F.unix_micros("ts") > med),
        wave(w1),
        wave(w2),
    ]
    for i, p in enumerate(parts):
        tmp = os.path.join(workdir, f"_stage{i}")
        p.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = os.path.join(workdir, f"batch-{i:03d}.parquet")
        os.replace(os.path.join(tmp, src), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(TAGGED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(workdir)
    )
    return run_stream_to_memory(
        asof_enrich_stream(stream, watermark=f"{watermark_s} seconds"),
        mode="append",
        state_partitions=state_partitions,
    )

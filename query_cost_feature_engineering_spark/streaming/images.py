"""Streaming ingest of the image+caption table — the continuous-arrival
variant of the flagship featurize stage.

At 10^12-image scale new images land continuously; the per-image
featurization (decode + pixel stats + phash bits + caption tokens) is
stateless, so it streams: each micro-batch runs the IDENTICAL JVM
expressions and the one Arrow decode UDF the batch plan uses
(``plans/pipeline.compute_features`` stages 1-4), drops ``bytes``
in-flight, and appends narrow feature rows to the feature store. The
entity-window layer (lag/lead/backfill/rolling/sessionize) is
deliberately NOT streamed here — it needs per-entity event-time ordering,
which in this engine is either the batch window pass over the feature
store (cheap: windows read the narrow table, not the payloads) or the
bounded-state per-entity operator
(``streaming/sessions.stateful_user_stats_stream``) when incremental
emission is required.

Row-for-row parity with the batch stage is pinned by
``tests/test_streaming.py::test_stream_image_features_matches_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from query_cost_feature_engineering_spark.functions.image_features import (
    with_basics,
    with_image_features,
    with_phash_bits,
)
from query_cost_feature_engineering_spark.functions.text import (
    with_caption_features,
)

# BASELINE.json input_hint shape + the point-in-time spine columns
IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, entity_id long, ts timestamp"
)


def read_images_stream(
    spark: SparkSession, path: str, max_files: int = 2
) -> DataFrame:
    """File-source stream over an images parquet dir. ``maxFilesPerTrigger``
    bounds micro-batch size (on a real deployment this is the Kafka/object
    -store ingest rate knob)."""
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_to_feature_store(
    features: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain a (bounded) feature stream into a parquet feature store with
    exactly-once semantics across restarts.

    Spark's streaming checkpoint guarantees each micro-batch id is
    replayed after a crash until committed; plain parquet ``append`` would
    turn that replay into duplicate rows. Writing each batch to its OWN
    partition directory (``batch=<id>``) with ``overwrite`` makes the
    replay idempotent — the re-run overwrites the same directory — with no
    side-channel markers and no transactional table format needed. The
    incremental-resume behavior (new input files → only new batches
    written) is pinned by ``tests/test_streaming.py``.

    This is the streaming twin of ``runtime/checkpoint.write_resumable``
    (same idea: partition-scoped overwrite keyed on durable progress
    state; there the key is data partitions + input fingerprint, here it
    is the micro-batch id in the stream checkpoint).

    Invariant: one store belongs to ONE checkpoint lineage — batch ids
    are per-checkpoint, so pointing a second checkpoint at the same
    store restarts them at 0 and clobbers ``batch=0``. To upgrade the
    pipeline (e.g. add a feature column), keep the checkpoint and change
    the chain: stateless foreachBatch permits query evolution, ids
    continue past the committed ones, and history stays untouched
    (pinned by the schema-evolution test)."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (
        features.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_feature_store(
    spark: SparkSession, out_dir: str, merge_schema: bool = False
) -> DataFrame:
    """Feature-store scan: partition discovery picks up the ``batch=N``
    dirs; the batch id is lineage metadata, not a feature — dropped.

    ``merge_schema=True`` unions the footer schemas across batches, so a
    pipeline that started emitting a NEW feature column keeps all its
    history readable (old batches surface the column as null) — additive
    schema evolution without rewriting a single old file. Off by default:
    schema merging reads every file's footer at planning time, which on a
    many-batch store is a real cost to opt into, not a freebie."""
    r = spark.read.option("mergeSchema", "true") if merge_schema else spark.read
    return r.parquet(out_dir).drop("batch")


def image_features_stream(images: DataFrame) -> DataFrame:
    """Stateless featurize stage on a stream: identical operator chain to
    the batch plan's pre-window stages, so streamed rows are bitwise equal
    to batch rows. ``bytes``/``caption`` never reach the sink."""
    df = with_basics(images)
    df = with_image_features(df)
    df = with_phash_bits(df)
    df = with_caption_features(df)
    return df.drop("bytes", "caption")

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


def image_features_stream(images: DataFrame) -> DataFrame:
    """Stateless featurize stage on a stream: identical operator chain to
    the batch plan's pre-window stages, so streamed rows are bitwise equal
    to batch rows. ``bytes``/``caption`` never reach the sink."""
    df = with_basics(images)
    df = with_image_features(df)
    df = with_phash_bits(df)
    df = with_caption_features(df)
    return df.drop("bytes", "caption")

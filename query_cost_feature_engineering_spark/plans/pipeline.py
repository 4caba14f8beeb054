"""The flagship plan: image+caption table → per-(entity, ts) feature vectors.

Stage order mirrors the reference's dataset-build lifecycle (SURVEY.md §3,
EP1/EP2: parse → featurize → group → normalize → vectorize), re-expressed
as one declarative Spark plan:

    scan (parquet/Iceberg; `bytes` column pruned until the decode UDF)
    → JVM-side basics/fmt/phash-bit/caption features
    → ONE Arrow-batched pandas UDF (decode + pixel stats)
    → drop `bytes` before any shuffle (never shuffle image payloads)
    → Window layer: lag/lead, ffill backfill, rolling mean, sessionize
    → assemble fixed-width feature vector (array<double>, FIXTURES.md F3)

The vector layout (FEATURE_ORDER) is the engine's equivalent of the
reference's per-operator fixed-width layout ``tpch_dim_dict``
(tpch_utils_knob.py:27-52): basics ⧺ one-hots ⧺ stats ⧺ identity bits ⧺
token counts ⧺ temporal features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from query_cost_feature_engineering_spark.functions.image_features import (
    DECODE_COLS,
    HIST_COLS,
    STAT_COLS,
    with_basics,
    with_image_features,
    with_phash_bits,
)
from query_cost_feature_engineering_spark.functions.text import (
    with_caption_features,
)
from query_cost_feature_engineering_spark.operators.windows import (
    with_backfill,
    with_lag_lead,
    with_rolling_mean,
    with_session_ids,
)
from query_cost_feature_engineering_spark.sources.images import VOCAB

WINDOW_COLS = [
    "lag1_px_mean", "lag2_px_mean", "lead1_px_mean", "lead2_px_mean",
    "bf_png_mean", "roll3_px_mean", "session_id",
]

# expanding-window snapshot factors (ref inner_vector analog, leakage-free)
SNAP_COLS = ["snap_slope", "snap_intercept"]

FEATURE_ORDER: list[str] = (
    ["w", "h", "nbytes", "fmt_png", "fmt_jpeg"]
    + STAT_COLS
    + HIST_COLS
    + [f"ph_{i}" for i in range(64)]
    + ["token_count"]
    + [f"tok_{w}" for w in VOCAB]
    + WINDOW_COLS
    + SNAP_COLS
)


def compute_features(images: DataFrame) -> DataFrame:
    """Flat feature columns per (entity_id, ts, image_id)."""
    df = with_basics(images)
    df = with_image_features(df)
    df = with_phash_bits(df)
    df = with_caption_features(df)
    df = df.drop("bytes", "caption")  # payloads never cross a shuffle
    df = with_lag_lead(df, "px_mean")
    df = df.withColumn(
        "_png_mean", F.when(F.col("fmt") == "png", F.col("px_mean"))
    )
    df = with_backfill(df, "_png_mean", "bf_png_mean").drop("_png_mean")
    df = with_rolling_mean(df, "px_mean", 3)
    df = with_session_ids(df)
    from query_cost_feature_engineering_spark.operators.snapshot import (
        with_expanding_linear_fit,
    )

    df = with_expanding_linear_fit(df, "nbytes", "px_mean")
    return df


def assemble_vector(df: DataFrame, out_col: str = "features") -> DataFrame:
    """Pack FEATURE_ORDER into one array<double>; nulls (warm-up lags) → 0."""
    return df.withColumn(
        out_col,
        F.array(
            *[
                F.coalesce(F.col(c).cast("double"), F.lit(0.0))
                for c in FEATURE_ORDER
            ]
        ),
    )


__all__ = [
    "FEATURE_ORDER",
    "WINDOW_COLS",
    "DECODE_COLS",
    "STAT_COLS",
    "HIST_COLS",
    "compute_features",
    "assemble_vector",
]

"""Sharpness gate (blur_detect_images) — variance-of-Laplacian +
Tenengrad.

The DuckDB oracle pins the full output against an independent
pure-Python loop recompute (golden.ensure_blur_fixture); these tests
pin the math on hand-computed micro-images, the planted-blur class
separation, and the tiny-image guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from query_cost_feature_engineering_spark.codecs import encode_png
from query_cost_feature_engineering_spark.functions.image_features import (
    sharpness_stats_pandas,
)
from query_cost_feature_engineering_spark.sources.images import (
    _box_blur3,
    generate_blur_corpus_pandas,
)


def _stats_for(arr: np.ndarray) -> pd.Series:
    """Run the UDF core on one encoded-gray-as-RGB image."""
    rgb = np.repeat(arr[..., None], 3, axis=2).astype(np.uint8)
    out = sharpness_stats_pandas(
        pd.Series([encode_png(rgb)]), pd.Series(["png"])
    )
    return out.iloc[0]


def test_hand_computed_3x3():
    # Single interior pixel: lap = 0+8+2+6-4*4 = 0, n=1 so var = 0;
    # gx = 6-2 = 4, gy = 8-0 = 8 -> tenengrad = 16+64 = 80.
    g = np.array([[0, 0, 0], [2, 4, 6], [8, 8, 8]], dtype=np.uint8)
    st = _stats_for(g)
    assert st["lap_var"] == 0.0
    assert st["tenengrad"] == 80.0
    assert (st["dec_w"], st["dec_h"]) == (3, 3)


def test_hand_computed_variance():
    # 3x4: two interior pixels, laps computed by hand.
    g = np.array(
        [[10, 0, 0, 10], [0, 20, 40, 0], [10, 0, 0, 10]], dtype=np.uint8
    )
    # lap(1,1) = 0+0+0+40 - 80 = -40 ; lap(1,2) = 0+0+20+0 - 160 = -140
    # n=2, s=-180, ss=1600+19600=21200 -> var = (2*21200-32400)/4 = 2500
    st = _stats_for(g)
    assert st["lap_var"] == 2500.0


def test_flat_image_is_zero_everything():
    g = np.full((8, 8), 77, dtype=np.uint8)
    st = _stats_for(g)
    assert st["lap_var"] == 0.0 and st["tenengrad"] == 0.0


def test_tiny_image_guard():
    g = np.array([[1, 200], [200, 1]], dtype=np.uint8)
    st = _stats_for(g)
    assert st["lap_var"] == 0.0 and st["tenengrad"] == 0.0
    assert (st["dec_w"], st["dec_h"]) == (2, 2)


def test_box_blur_reduces_lap_var():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    sharp = _stats_for(g)
    blurred = _stats_for(_box_blur3(np.repeat(g[..., None], 3, 2))[:, :, 0])
    assert blurred["lap_var"] < sharp["lap_var"] / 5


def test_planted_classes_fully_separated():
    pdf = generate_blur_corpus_pandas(48, 42)
    st = sharpness_stats_pandas(pdf["bytes"], pdf["fmt"])
    lv = st["lap_var"].to_numpy()
    truth = pdf["blur_true"].to_numpy()
    assert lv[truth].max() < 800.0 < lv[~truth].min()


def test_query_gate_recovers_planted_labels(spark):
    from query_cost_feature_engineering_spark.queries import blur_detect_images

    rows = blur_detect_images(spark, "unused").collect()
    assert len(rows) == 240
    for r in rows:
        assert r.is_sharp == (not r.blur_true)


def test_blur_corpus_phash_consistent_with_payload():
    """The generator recomputes phash for blurred rows so the public
    corpus never carries a hash of pixels that are not in the payload."""
    from query_cost_feature_engineering_spark.codecs import (
        decode_image,
        phash64,
    )

    pdf = generate_blur_corpus_pandas(18, 42)
    for _, r in pdf.iterrows():
        arr = decode_image(bytes(r["bytes"]), r["fmt"])
        assert int(r["phash"]) == phash64(arr) or r["fmt"] == "jpeg"

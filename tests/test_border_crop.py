"""Uniform-border detection (border_crop_images).

The DuckDB oracle pins run lengths against a per-pixel-loop recompute;
these tests pin the self-anchored semantics on crafted images (one-sided
borders, no border, fully uniform) and the exact planted-pad recovery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from query_cost_feature_engineering_spark.codecs import encode_png
from query_cost_feature_engineering_spark.functions.image_features import (
    border_stats_pandas,
)
from query_cost_feature_engineering_spark.sources.images import (
    generate_letterbox_corpus_pandas,
)


def _detect(arr: np.ndarray):
    out = border_stats_pandas(
        pd.Series([encode_png(arr)]), pd.Series(["png"])
    )
    r = out.iloc[0]
    return (r["border_t"], r["border_b"], r["border_l"], r["border_r"])


def _noise(h, w, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3)
    ).astype(np.uint8)


def test_bottom_only_border_found():
    img = _noise(10, 12)
    img[7:, :, :] = 255
    assert _detect(img) == (0, 3, 0, 0)


def test_right_only_border_found():
    img = _noise(10, 12)
    img[:, 9:, :] = 0
    assert _detect(img) == (0, 0, 0, 3)


def test_all_sides():
    img = np.full((20, 20, 3), 128, dtype=np.uint8)
    img[2:15, 4:19] = _noise(13, 15)
    assert _detect(img) == (2, 5, 4, 1)


def test_no_border():
    assert _detect(_noise(16, 16)) == (0, 0, 0, 0)


def test_fully_uniform_is_all_border():
    img = np.full((8, 6, 3), 200, dtype=np.uint8)
    assert _detect(img) == (8, 0, 6, 0)


def test_planted_pads_recovered_exactly():
    pdf = generate_letterbox_corpus_pandas(60, 61)
    st = border_stats_pandas(pdf["bytes"], pdf["fmt"])
    for det, tru in (
        ("border_t", "pad_t"), ("border_b", "pad_b"),
        ("border_l", "pad_l"), ("border_r", "pad_r"),
    ):
        assert (st[det].values == pdf[tru].values).all()


def test_query_crop_consistency(spark):
    from query_cost_feature_engineering_spark.queries import border_crop_images

    rows = border_crop_images(spark, "unused").collect()
    assert len(rows) == 200
    for r in rows:
        assert r.crop_w == r.img_w - r.border_l - r.border_r > 0
        assert r.crop_h == r.img_h - r.border_t - r.border_b > 0
        assert r.is_letterboxed == (
            (r.pad_t, r.pad_b, r.pad_l, r.pad_r) != (0, 0, 0, 0)
        )


def test_vertical_stripes_is_all_border_both_sides():
    """Every column uniform while rows are not (the degenerate twin of
    the fully-uniform image): normalized to an empty-but-never-negative
    crop box, identically in the vectorized detector and the fixture's
    loop recompute."""
    from query_cost_feature_engineering_spark.golden import (
        _border_runs_loop_py,
    )

    img = np.zeros((6, 6, 3), dtype=np.uint8)
    for x in range(6):
        img[:, x, :] = x * 40  # vertical stripes
    assert _detect(img) == (0, 0, 6, 0)
    assert _border_runs_loop_py(img) == (0, 0, 6, 0)
    # crop box is empty, not negative
    t, b, l, r = _detect(img)
    assert 6 - l - r == 0 and 6 - t - b == 6


def test_horizontal_stripes_parity():
    from query_cost_feature_engineering_spark.golden import (
        _border_runs_loop_py,
    )

    img = np.zeros((6, 6, 3), dtype=np.uint8)
    for y in range(6):
        img[y, :, :] = y * 40  # horizontal stripes: all rows uniform
    assert _detect(img) == (6, 0, 6, 0)
    assert _border_runs_loop_py(img) == (6, 0, 6, 0)

"""FIXTURES.md F5 property probes: temporal leakage, boundary, determinism.

Leakage contract: every BACKWARD feature at (entity, ts' ≤ t) must be
byte-identical when recomputed on the table truncated to ts ≤ t. The two
``lead*`` columns are label-side (explicitly forward-looking, the analog of
the reference's target columns) and are excluded by design.
"""

import numpy as np

from query_cost_feature_engineering_spark.plans.pipeline import (
    FEATURE_ORDER,
    compute_features,
)

KEY = ["entity_id", "ts", "image_id"]
BACKWARD = [c for c in FEATURE_ORDER if not c.startswith("lead")]


def test_zero_temporal_leakage(spark, images_pdf, images_sdf):
    cutoff = images_pdf["ts"].quantile(0.6)
    full = (
        compute_features(images_sdf)
        .where(f"ts <= timestamp'{cutoff}'")
        .toPandas()
        .sort_values(KEY, kind="mergesort")
        .reset_index(drop=True)
    )
    truncated_in = spark.createDataFrame(images_pdf[images_pdf["ts"] <= cutoff])
    trunc = (
        compute_features(truncated_in)
        .toPandas()
        .sort_values(KEY, kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(full) == len(trunc) > 0
    for c in BACKWARD:
        a = full[c].to_numpy(dtype=np.float64)
        b = trunc[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, rtol=0, atol=0, equal_nan=True), c


def test_determinism_two_runs(spark, images_sdf):
    a = compute_features(images_sdf).toPandas().sort_values(KEY).reset_index(drop=True)
    b = compute_features(images_sdf).toPandas().sort_values(KEY).reset_index(drop=True)
    for c in FEATURE_ORDER:
        assert np.allclose(
            a[c].astype(float), b[c].astype(float), rtol=0, atol=0, equal_nan=True
        ), c


def test_repartition_invariance(spark, images_sdf):
    """Boundary probe: result independent of physical partitioning."""
    base = (
        compute_features(images_sdf)
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    shuffled = (
        compute_features(images_sdf.repartition(13))
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    for c in FEATURE_ORDER:
        assert np.allclose(
            base[c].astype(float),
            shuffled[c].astype(float),
            rtol=0, atol=0, equal_nan=True,
        ), c

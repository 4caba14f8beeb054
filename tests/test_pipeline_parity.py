"""Spark plan vs single-process golden oracle — numpy.allclose per
(entity_id, ts, image_id), the FIXTURES.md F3 contract."""

import numpy as np

from query_cost_feature_engineering_spark.golden import golden_features
from query_cost_feature_engineering_spark.plans.pipeline import (
    FEATURE_ORDER,
    assemble_vector,
    compute_features,
)

KEY = ["entity_id", "ts", "image_id"]


def test_feature_parity_allclose(spark, images_pdf, images_sdf):
    got = (
        compute_features(images_sdf)
        .toPandas()
        .sort_values(KEY, kind="mergesort")
        .reset_index(drop=True)
    )
    want = golden_features(images_pdf).sort_values(KEY, kind="mergesort").reset_index(
        drop=True
    )
    assert len(got) == len(want) == len(images_pdf)
    assert (got["image_id"].to_numpy() == want["image_id"].to_numpy()).all()
    for c in FEATURE_ORDER:
        g = got[c].to_numpy(dtype=np.float64)
        w = want[c].to_numpy(dtype=np.float64)
        assert np.allclose(g, w, rtol=1e-5, atol=1e-9, equal_nan=True), c


def test_vector_assembly_width_and_nulls(spark, images_sdf):
    out = assemble_vector(compute_features(images_sdf))
    row = out.select("features").first()
    assert len(row["features"]) == len(FEATURE_ORDER) == 160
    assert all(v is not None for v in row["features"])


def test_caption_exact_equality(spark, images_pdf, images_sdf):
    # per-row caption equality (input_hint contract) through the Spark scan
    got = (
        images_sdf.select("image_id", "caption")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    want = images_pdf[["image_id", "caption"]].sort_values("image_id").reset_index(
        drop=True
    )
    assert (got["caption"] == want["caption"]).all()

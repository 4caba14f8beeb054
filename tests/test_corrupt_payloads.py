"""Corrupt-payload tolerance: on_error='null' survives bad bytes, flags
them, and leaves good rows' stats untouched; strict mode still fails."""

from __future__ import annotations

import numpy as np
import pytest

from query_cost_feature_engineering_spark.functions.image_features import (
    with_image_features,
)


@pytest.fixture()
def mixed_sdf(spark, images_pdf):
    pdf = images_pdf.head(30).copy().reset_index(drop=True)
    bad = [3, 11, 27]
    col = pdf["bytes"].copy()
    col.iloc[bad[0]] = b"\x00corrupt"
    col.iloc[bad[1]] = b""
    col.iloc[bad[2]] = pdf["bytes"].iloc[bad[2]][:10]  # truncated PNG
    pdf["bytes"] = col
    return spark.createDataFrame(pdf), {pdf["image_id"].iloc[i] for i in bad}


def test_tolerant_mode_flags_corrupt_rows(spark, images_pdf, mixed_sdf):
    sdf, bad_ids = mixed_sdf
    out = (
        with_image_features(sdf, on_error="null")
        .select("image_id", "decode_ok", "px_mean")
        .toPandas()
        .set_index("image_id")
    )
    assert set(out.index[~out["decode_ok"]]) == bad_ids
    good = out[out["decode_ok"]]
    assert good["px_mean"].notna().all()
    # good rows match the strict-mode result on the clean table
    clean = (
        with_image_features(spark.createDataFrame(images_pdf.head(30)))
        .select("image_id", "px_mean")
        .toPandas()
        .set_index("image_id")
    )
    for iid in good.index:
        assert np.isclose(good.loc[iid, "px_mean"], clean.loc[iid, "px_mean"])


def test_strict_mode_fails_on_corrupt(mixed_sdf):
    sdf, _ = mixed_sdf
    with pytest.raises(Exception):
        with_image_features(sdf).select("px_mean").collect()

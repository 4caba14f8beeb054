"""Mixed-format capstone corpus (sources/images.py
generate_mixed_images_pandas + codecs.decode_image dispatch): nine
formats in one table, per-format fidelity class enforced against the
pre-encode arrays, determinism, and an in-test magic-byte table
(independent of both functions/multimodal._MAGIC and the golden
fixture) so container headers are pinned three ways."""

import numpy as np

from query_cost_feature_engineering_spark.codecs import decode_image
from query_cost_feature_engineering_spark.jpeg import psnr
from query_cost_feature_engineering_spark.sources.images import (
    generate_mixed_images_pandas,
)

LOSSLESS = {"png", "gif", "bmp", "tiff", "ico", "ppm", "tga"}

# independent magic-byte table, from the published specs (PNG sig,
# JPEG SOI, GIF87a/89a, BMP 'BM', TIFF II*\0, ICO reserved+type).
# TGA has no magic — dispatch is by declared fmt; PPM is ASCII 'P6'.
MAGIC = {
    "png": b"\x89PNG\r\n\x1a\n",
    "jpeg": b"\xff\xd8\xff",
    "jpeg_prog": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "bmp": b"BM",
    "tiff": b"II\x2a\x00",
    "ico": b"\x00\x00\x01\x00",
    "ppm": b"P6",
}


def test_mixed_corpus_shape_and_determinism():
    a = generate_mixed_images_pandas(27, seed=5)
    b = generate_mixed_images_pandas(27, seed=5)
    assert set(a["fmt"]) == LOSSLESS | {"jpeg", "jpeg_prog"}
    assert list(a["image_id"]) == list(b["image_id"])
    for x, y in zip(a["bytes"], b["bytes"]):
        assert bytes(x) == bytes(y)
    # all nine formats cycle evenly
    assert a.groupby("fmt").size().nunique() == 1


def test_mixed_corpus_fidelity_and_magic():
    pdf = generate_mixed_images_pandas(36, seed=11)
    for i in range(len(pdf)):
        fmt = str(pdf["fmt"].iloc[i])
        blob = bytes(pdf["bytes"].iloc[i])
        if fmt in MAGIC:
            assert blob.startswith(MAGIC[fmt]), fmt
        family = "jpeg" if fmt.startswith("jpeg") else fmt
        arr = decode_image(blob, family)
        true = pdf["arr_true"].iloc[i]
        assert arr.shape == true.shape, fmt
        if fmt in LOSSLESS:
            assert np.array_equal(arr, true), f"{fmt} must be lossless"
        else:
            p = psnr(true, arr)
            assert p >= 40.0, f"{fmt}: {p:.2f} dB"


def test_mixed_format_features_query(spark):
    from query_cost_feature_engineering_spark.queries import (
        mixed_format_features,
    )

    out = mixed_format_features(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 180
    assert out["fmt"].nunique() == 9
    # decoded dims always echo the corpus dims (every codec roundtrips
    # geometry); means are in-gamut
    assert ((out["px_mean"] >= 0) & (out["px_mean"] <= 255)).all()
    assert ((out["corner_mean"] >= 0) & (out["corner_mean"] <= 255)).all()

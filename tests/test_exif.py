"""EXIF orientation (jpeg.py): transform semantics vs independent
numpy references, insert/parse roundtrip on baseline and progressive
streams, TIFF endianness, and malformed-metadata robustness (metadata
must never break decode)."""

import struct

import numpy as np
import pytest

from query_cost_feature_engineering_spark.jpeg import (
    apply_exif_orientation,
    decode_jpeg,
    encode_jpeg,
    insert_exif_orientation,
    parse_exif_orientation,
)
from query_cost_feature_engineering_spark.jpeg_progressive import (
    encode_jpeg_progressive,
)


def test_orientation_transform_semantics():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    # independent references per CIPA DC-008 (row0/col0 definitions)
    ref = {
        1: arr,
        2: np.fliplr(arr),
        3: np.rot90(arr, 2),
        4: np.flipud(arr),
        5: np.transpose(arr, (1, 0, 2)),
        6: np.rot90(arr, -1),
        7: np.transpose(arr[::-1, ::-1], (1, 0, 2)),
        8: np.rot90(arr, 1),
    }
    for o, want in ref.items():
        assert np.array_equal(apply_exif_orientation(arr, o), want), o
    # inverse pairs undo (6 and 8 are each other's inverse)
    inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    for o in range(1, 9):
        back = apply_exif_orientation(apply_exif_orientation(arr, o), inv[o])
        assert np.array_equal(back, arr), o
    with pytest.raises(ValueError, match="orientation"):
        apply_exif_orientation(arr, 9)


def test_insert_parse_roundtrip_baseline_and_progressive():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        b = enc(arr, quality=95)
        assert parse_exif_orientation(b) is None
        for o in range(1, 9):
            t = insert_exif_orientation(b, o)
            assert parse_exif_orientation(t) == o
            # metadata never changes pixels
            assert np.array_equal(decode_jpeg(t), decode_jpeg(b))
    with pytest.raises(ValueError, match="orientation"):
        insert_exif_orientation(encode_jpeg(arr), 0)


def _app1(tiff: bytes) -> bytes:
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload


def test_parse_little_endian_and_malformed():
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    base = encode_jpeg(arr)
    # little-endian (II) TIFF, as most cameras write
    tiff_ii = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x0112, 3, 1)
        + struct.pack("<HH", 6, 0)
        + struct.pack("<I", 0)
    )
    tagged = base[:2] + _app1(tiff_ii) + base[2:]
    assert parse_exif_orientation(tagged) == 6
    assert decode_jpeg(tagged).shape == (8, 8, 3)
    # non-EXIF APP1 (XMP) is skipped, not misparsed
    xmp = b"\xff\xe1" + struct.pack(">H", 2 + 10) + b"http://ns."
    assert parse_exif_orientation(base[:2] + xmp + base[2:]) is None
    # truncated TIFF → None, decode unaffected
    broken = base[:2] + _app1(b"MM\x00\x2a\x00") + base[2:]
    assert parse_exif_orientation(broken) is None
    assert decode_jpeg(broken).shape == (8, 8, 3)
    # out-of-range orientation value → None
    tiff_bad = (
        b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHI", 0x0112, 3, 1)
        + struct.pack(">HH", 11, 0)
        + struct.pack(">I", 0)
    )
    assert parse_exif_orientation(base[:2] + _app1(tiff_bad) + base[2:]) is None
    # non-JPEG input
    assert parse_exif_orientation(b"\x89PNG\r\n") is None


def test_exif_corpus_and_udf_columns():
    from query_cost_feature_engineering_spark.sources.images import (
        generate_exif_images_pandas,
    )

    pdf = generate_exif_images_pandas(40, seed=57)
    tagged = pdf[pdf["orientation_true"] > 0]
    assert len(tagged) > 10 and set(tagged["orientation_true"]) - set(
        range(1, 9)
    ) == set()
    assert (pdf["orientation_true"] == 0).any()  # missing-EXIF case present
    for i in range(len(pdf)):
        o = parse_exif_orientation(bytes(pdf["bytes"].iloc[i]))
        assert (o or 0) == int(pdf["orientation_true"].iloc[i])

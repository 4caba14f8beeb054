"""BMP codec (codecs.py): 24-bit roundtrips with stride padding, and
decode of hand-built real-file shapes — 32-bit BGRA, 8-bit palettized,
top-down (negative biHeight), V5-size headers — plus refusals."""

import struct

import numpy as np
import pytest

from query_cost_feature_engineering_spark.codecs import (
    decode_bmp,
    decode_image,
    encode_bmp,
)


def test_bmp_roundtrip_24bit():
    rng = np.random.default_rng(8)
    # widths chosen so row strides hit all four pad sizes (0-3 bytes)
    for shape in ((13, 17), (8, 8), (1, 1), (31, 2), (5, 3)):
        a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a), shape
        assert np.array_equal(decode_image(encode_bmp(a), "bmp"), a)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PM" + bytes(60))


def _bmp(info: bytes, pix: bytes, pal: bytes = b"") -> bytes:
    off = 14 + len(info) + len(pal)
    return (
        struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
        + info + pal + pix
    )


def test_bmp_32bit_topdown_and_palette():
    rng = np.random.default_rng(9)
    h, w = 5, 3
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    rows = np.zeros((h, w * 4), np.uint8)
    rows[:, 0::4], rows[:, 1::4], rows[:, 2::4] = (
        a[:, :, 2], a[:, :, 1], a[:, :, 0],
    )
    rows[:, 3::4] = 255  # alpha, dropped
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 32, 0, rows.nbytes, 0, 0, 0, 0
    )
    assert np.array_equal(decode_bmp(_bmp(info, rows.tobytes())), a)
    # 8-bit palettized, bottom-up, 16-entry BGRX palette
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    palbytes = b"".join(
        bytes([int(c[2]), int(c[1]), int(c[0]), 0]) for c in pal
    )
    idx = rng.integers(0, 16, (6, 5), dtype=np.uint8)
    stride = (5 + 3) & ~3
    rows8 = np.zeros((6, stride), np.uint8)
    rows8[:, :5] = idx[::-1]
    info8 = struct.pack(
        "<IiiHHIIiiII", 40, 5, 6, 1, 8, 0, rows8.nbytes, 0, 0, 16, 0
    )
    got = decode_bmp(_bmp(info8, rows8.tobytes(), palbytes))
    assert np.array_equal(got, pal[idx])
    # V5-size header (124 bytes): palette offset follows declared size
    info5 = struct.pack(
        "<IiiHHIIiiII", 124, 5, 6, 1, 8, 0, rows8.nbytes, 0, 0, 16, 0
    ) + bytes(124 - 40)
    got5 = decode_bmp(_bmp(info5, rows8.tobytes(), palbytes))
    assert np.array_equal(got5, pal[idx])
    # refusals: RLE compression, 4-bpp
    bad = struct.pack("<IiiHHIIiiII", 40, 5, 6, 1, 8, 1, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="compressed"):
        decode_bmp(_bmp(bad, b""))
    bad4 = struct.pack("<IiiHHIIiiII", 40, 5, 6, 1, 4, 0, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="bpp"):
        decode_bmp(_bmp(bad4, b""))

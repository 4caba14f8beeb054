"""GIF codec (gif.py): lossless paletted roundtrips (single frame,
animation, interlace, dictionary reset past 4096 codes, 2..256-color
palettes) plus decode-only real-file shapes via hand-built streams —
partial-rect frames, local color tables, transparency, and disposal
methods 1/2/3 — checked against an independently hand-composited
reference."""

import struct

import numpy as np
import pytest

from query_cost_feature_engineering_spark.gif import (
    _lzw_encode,
    _subblocks,
    decode_gif,
    encode_gif,
)


def test_gif_lossless_roundtrips():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 16, (23, 31))]
    f, _ = decode_gif(encode_gif(img))
    assert f.shape == (1, 23, 31, 3) and np.array_equal(f[0], img)
    # interlaced encode → decode
    f2, _ = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(f2[0], img)
    # animation with delays
    anim = pal[rng.integers(0, 16, (5, 17, 19))]
    f3, d3 = decode_gif(encode_gif(anim, delays_cs=[7, 8, 9, 10, 11]))
    assert np.array_equal(f3, anim) and d3 == [7, 8, 9, 10, 11]
    # 2-color and 256-color palettes; dict reset past 4096 codes
    bw = np.where(rng.random((9, 14, 1)) < 0.5, 0, 255).astype(
        np.uint8
    ).repeat(3, axis=2)
    assert np.array_equal(decode_gif(encode_gif(bw))[0][0], bw)
    pal256 = np.arange(256, dtype=np.uint8)[:, None].repeat(3, axis=1)
    img256 = pal256[rng.integers(0, 256, (50, 60))]
    assert np.array_equal(decode_gif(encode_gif(img256))[0][0], img256)
    pal64 = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    big = pal64[rng.integers(0, 64, (200, 200))]
    assert np.array_equal(decode_gif(encode_gif(big))[0][0], big)
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif(rng.integers(0, 256, (20, 20, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF89a" + bytes(40))


def _image_block(left, top, idx, mcs, lct=None, interlace=False):
    ih, iw = idx.shape
    flags = (0x40 if interlace else 0)
    if lct is not None:
        k = len(lct)
        size_bits = max(1, (k - 1).bit_length())
        flags |= 0x80 | (size_bits - 1)
    out = b"\x2c" + struct.pack("<HHHH", left, top, iw, ih) + bytes([flags])
    if lct is not None:
        full = np.zeros((1 << size_bits, 3), dtype=np.uint8)
        full[: len(lct)] = lct
        out += full.tobytes()
    out += bytes([mcs]) + _subblocks(_lzw_encode(idx.ravel(), mcs))
    return out


def _gce(disposal=0, transparent=None, delay=0):
    gpk = (disposal & 7) << 2
    t = 0
    if transparent is not None:
        gpk |= 1
        t = transparent
    return b"\x21\xf9" + bytes([4, gpk]) + struct.pack("<H", delay) + bytes(
        [t, 0]
    )


def _header(w, h, gct, bg=0):
    size_bits = max(1, (len(gct) - 1).bit_length())
    full = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    full[: len(gct)] = gct
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), bg, 0)
        + full.tobytes()
    )


def test_gif_partial_rect_transparency_and_disposal():
    """Three-frame animation with partial rects over a 6x8 canvas:
    frame 2 draws a transparent-holed patch with disposal=3 (restore
    previous), frame 3 a patch with disposal=2 (restore background).
    The reference compositor below is written independently of
    gif.py's."""
    gct = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8
    )
    bg = 0
    base = np.full((6, 8), 1, np.uint8)  # full-canvas red frame
    patch = np.array([[2, 3, 2], [3, 0, 3]], np.uint8)  # 2x3, idx 0 hole
    data = (
        _header(8, 6, gct, bg)
        + _gce(disposal=1, delay=5)
        + _image_block(0, 0, base, 2)
        + _gce(disposal=3, transparent=0, delay=6)
        + _image_block(2, 1, patch, 2)
        + _gce(disposal=2, delay=7)
        + _image_block(5, 4, np.array([[3]], np.uint8), 2)
        + _gce(delay=8)
        + _image_block(0, 0, np.array([[2]], np.uint8), 2)
        + b"\x3b"
    )
    frames, delays = decode_gif(data)
    assert delays == [5, 6, 7, 8]
    # independent reference compositing
    f1 = gct[base]
    f2 = f1.copy()
    for y in range(2):
        for x in range(3):
            if patch[y, x] != 0:  # transparent index 0
                f2[1 + y, 2 + x] = gct[patch[y, x]]
    f3 = f1.copy()  # disposal=3 restored frame 1's canvas
    f3[4, 5] = gct[3]
    f4 = f1.copy()  # disposal=2 restored [4,5] to BACKGROUND color
    f4[4, 5] = gct[bg]
    f4[0, 0] = gct[2]
    for got, want in zip(frames, [f1, f2, f3, f4]):
        assert np.array_equal(got, want)


def test_gif_local_color_table_and_87a():
    """A frame's local table overrides the global one; GIF87a magic
    (no extensions) also parses."""
    gct = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    lct = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    data = (
        _header(2, 2, gct)
        + _image_block(0, 0, idx, 2, lct=lct)
        + b"\x3b"
    )
    frames, _ = decode_gif(data)
    assert np.array_equal(frames[0], lct[idx])
    data87 = b"GIF87a" + data[6:]
    frames87, _ = decode_gif(data87)
    assert np.array_equal(frames87[0], lct[idx])
    # interlaced hand-built block (encoder-side order written here)
    rng = np.random.default_rng(3)
    big = rng.integers(0, 2, (11, 5)).astype(np.uint8)
    from query_cost_feature_engineering_spark.gif import _interlace_order

    rows = big[_interlace_order(11)]
    d2 = _header(5, 11, gct) + _image_block(
        0, 0, rows, 2, interlace=True
    ) + b"\x3b"
    frames2, _ = decode_gif(d2)
    assert np.array_equal(frames2[0], gct[big])


def test_gif_dispatch_and_sniff():
    from query_cost_feature_engineering_spark.codecs import decode_image
    from query_cost_feature_engineering_spark.functions.multimodal import (
        _sniff_head,
        decode_video,
    )

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 8, (12, 15))]
    data = encode_gif(img)
    assert _sniff_head(data[:12]) == "gif"
    assert np.array_equal(decode_image(data, "gif"), img)
    anim = pal[rng.integers(0, 8, (4, 10, 10))]
    vdata = encode_gif(anim, delays_cs=[5, 5, 5, 5])
    frames = decode_video(vdata)
    assert frames.shape == (4, 10, 10, 3) and np.array_equal(frames, anim)

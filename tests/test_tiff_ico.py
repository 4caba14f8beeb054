"""TIFF + ICO codecs: lossless roundtrips across every compression /
strip layout, spec-derived PackBits and LZW early-change vectors,
decode-only hand-built shapes (big-endian, grayscale incl. MinIsWhite,
palette, 16-bit, multi-strip offsets in overflow arrays), ICO
PNG-member and DIB-member decode, and dispatch/sniff wiring."""

import struct

import numpy as np
import pytest

from query_cost_feature_engineering_spark.codecs import (
    decode_ico,
    decode_image,
    encode_ico,
)
from query_cost_feature_engineering_spark.functions.multimodal import (
    _sniff_head,
)
from query_cost_feature_engineering_spark.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


def test_tiff_roundtrips_all_compressions():
    rng = np.random.default_rng(4)
    noise = rng.integers(0, 256, (37, 23, 3), dtype=np.uint8)
    smooth = np.clip(
        np.cumsum(rng.normal(0, 3, (40, 50, 3)), axis=1) + 128, 0, 255
    ).astype(np.uint8)
    for comp in ("none", "packbits", "lzw"):
        for rps in (None, 7):
            for a in (noise, smooth):
                d = encode_tiff(a, compression=comp, rows_per_strip=rps)
                assert np.array_equal(decode_tiff(d), a), (comp, rps)
    # LZW + predictor really compresses smooth content
    assert len(encode_tiff(smooth, compression="lzw")) < 0.75 * smooth.nbytes
    assert np.array_equal(
        decode_image(encode_tiff(noise), "tiff"), noise
    )
    assert _sniff_head(encode_tiff(noise)[:12]) == "tiff"
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX" + bytes(40))


def test_packbits_and_lzw_vectors():
    # PackBits: the spec's canonical example stream (TIFF 6.0 §9)
    unpacked = bytes(
        [0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
        + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 7
    )
    packed = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
         0x03, 0x80, 0x00, 0x2A, 0x22, 0xFA, 0xAA]
    )
    assert packbits_decode(packed, len(unpacked)) == unpacked
    assert packbits_encode(unpacked) == packed  # same greedy as the spec
    # LZW early change: code width grows at entry 510/1022/2046, dict
    # resets at 4094; cross-boundary roundtrips incl. the KwKwK case
    rng = np.random.default_rng(4)
    for n in (10, 511, 513, 1000, 20000, 300000):
        b = bytes(rng.integers(0, 7, n, dtype=np.uint8))
        assert lzw_decode(lzw_encode(b), n) == b, n
        b2 = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert lzw_decode(lzw_encode(b2), n) == b2, ("hi", n)
    b3 = b"ab" * 5000
    assert lzw_decode(lzw_encode(b3), len(b3)) == b3
    # first emitted data code after CLEAR is 9 bits: stream starts
    # with CLEAR(256) = 100000000 -> first byte 0x80
    assert lzw_encode(b"A")[0] == 0x80


def _tiff(e, tags, pixels, extra=b""):
    """Hand-build a one-IFD TIFF with inline-or-overflow tag values."""
    pos = 8
    strips = pixels if isinstance(pixels, list) else [pixels]
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    full = dict(tags)
    full[273] = (4, offsets)
    full[279] = (4, [len(s) for s in strips])
    items = sorted(full.items())
    ifd_off = pos
    over_off = ifd_off + 2 + 12 * len(items) + 4
    fmt = {3: "H", 4: "I"}
    ifd = struct.pack(e + "H", len(items))
    overflow = bytearray()
    for t, (typ, vals) in items:
        payload = struct.pack(e + fmt[typ] * len(vals), *vals)
        if len(payload) <= 4:
            raw = payload + b"\x00" * (4 - len(payload))
        else:
            raw = struct.pack(e + "I", over_off + len(overflow))
            overflow += payload
        ifd += struct.pack(e + "HHI", t, typ, len(vals)) + raw
    ifd += struct.pack(e + "I", 0)
    magic = b"II" if e == "<" else b"MM"
    return (
        magic + struct.pack(e + "HI", 42, ifd_off)
        + b"".join(strips) + ifd + bytes(overflow)
    )


def test_tiff_decode_only_shapes():
    rng = np.random.default_rng(5)
    # big-endian grayscale (photometric 1)
    g = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    d = _tiff(
        ">",
        {256: (4, [13]), 257: (4, [9]), 258: (3, [8]), 259: (3, [1]),
         262: (3, [1]), 277: (3, [1]), 278: (4, [9])},
        g.tobytes(),
    )
    assert np.array_equal(decode_tiff(d), np.repeat(g[:, :, None], 3, 2))
    # MinIsWhite inverts
    d0 = _tiff(
        "<",
        {256: (4, [13]), 257: (4, [9]), 258: (3, [8]), 259: (3, [1]),
         262: (3, [0]), 277: (3, [1]), 278: (4, [9])},
        g.tobytes(),
    )
    assert np.array_equal(
        decode_tiff(d0), np.repeat((255 - g)[:, :, None], 3, 2)
    )
    # palette (ColorMap is 16-bit, high byte is the 8-bit value)
    pal8 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    cmap = (pal8.astype(np.uint32) << 8).T.ravel().tolist()
    idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
    dp = _tiff(
        "<",
        {256: (4, [7]), 257: (4, [5]), 258: (3, [8]), 259: (3, [1]),
         262: (3, [3]), 277: (3, [1]), 278: (4, [5]),
         320: (3, cmap)},
        idx.tobytes(),
    )
    assert np.array_equal(decode_tiff(dp), pal8[idx])
    # 16-bit RGB big-endian → high byte
    r16 = rng.integers(0, 65536, (4, 6, 3)).astype(np.uint16)
    d16 = _tiff(
        ">",
        {256: (4, [6]), 257: (4, [4]), 258: (3, [16, 16, 16]),
         259: (3, [1]), 262: (3, [2]), 277: (3, [3]), 278: (4, [4])},
        r16.astype(">u2").tobytes(),
    )
    assert np.array_equal(decode_tiff(d16), (r16 >> 8).astype(np.uint8))
    # refusals: tiled, unknown compression
    with pytest.raises(NotImplementedError, match="tiled"):
        decode_tiff(
            _tiff("<", {256: (4, [2]), 257: (4, [2]), 322: (4, [2])}, b"\x00")
        )
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(
            _tiff(
                "<",
                {256: (4, [2]), 257: (4, [1]), 258: (3, [8]),
                 259: (3, [7]), 262: (3, [1]), 277: (3, [1])},
                b"\x00\x00",
            )
        )


def test_ico_png_and_dib_members():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    data = encode_ico(a)
    assert _sniff_head(data[:12]) == "ico"
    assert np.array_equal(decode_ico(data), a)
    assert np.array_equal(decode_image(data, "ico"), a)
    # hand-built 32-bpp DIB member: biHeight doubled for the AND mask
    h, w = 8, 8
    b = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    rows = np.zeros((h, w * 4), np.uint8)
    rows[:, 0::4], rows[:, 1::4], rows[:, 2::4] = (
        b[::-1, :, 2], b[::-1, :, 1], b[::-1, :, 0],
    )
    and_mask = bytes(((w + 31) // 32) * 4 * h)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, 0, 0, 0, 0, 0
    )
    payload = info + rows.tobytes() + and_mask
    entry = struct.pack(
        "<BBBBHHII", w, h, 0, 0, 1, 32, len(payload), 22
    )
    ico = struct.pack("<HHH", 0, 1, 1) + entry + payload
    assert np.array_equal(decode_ico(ico), b)
    # multi-member: the LARGER member wins (two PNG payloads)
    from query_cost_feature_engineering_spark.codecs import encode_png

    p1, p2 = encode_png(a[:8, :8]), encode_png(a)
    off1 = 6 + 32
    e1 = struct.pack("<BBBBHHII", 8, 8, 0, 0, 1, 32, len(p1), off1)
    e2 = struct.pack(
        "<BBBBHHII", 18, 24, 0, 0, 1, 32, len(p2), off1 + len(p1)
    )
    two = struct.pack("<HHH", 0, 1, 2) + e1 + e2 + p1 + p2
    assert np.array_equal(decode_ico(two), a)
    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"\x01\x00\x01\x00" + bytes(20))

"""PNM / TGA / AIFF / Sun-AU codecs: roundtrips, decode-only shapes
(ASCII PNM, 16-bit maxval scaling, grey + top-down TGA, stereo AIFF,
80-bit extended-float sample rates, AU μ-law via the swept G.711 LUT),
dispatch wiring, and refusals."""

import struct

import numpy as np
import pytest

from query_cost_feature_engineering_spark.codecs import (
    _ULAW_LUT,
    decode_aiff,
    decode_au,
    decode_image,
    decode_pnm,
    decode_tga,
    encode_aiff,
    encode_au,
    encode_pnm,
    encode_tga,
    ulaw_encode,
)
from query_cost_feature_engineering_spark.functions.multimodal import (
    _sniff_head,
    decode_audio,
)


def test_pnm_shapes():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(a)), a)
    assert np.array_equal(decode_image(encode_pnm(a), "ppm"), a)
    assert _sniff_head(encode_pnm(a)[:12]) == "ppm"
    g = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    g3 = np.repeat(g[:, :, None], 3, axis=2)
    # binary grey with a header comment
    assert np.array_equal(
        decode_pnm(b"P5\n# c\n7 5\n255\n" + g.tobytes()), g3
    )
    # ASCII P2/P3
    p2 = ("P2\n7 5\n# mid\n255\n" + " ".join(map(str, g.ravel()))).encode()
    assert np.array_equal(decode_pnm(p2 + b"\n"), g3)
    p3 = ("P3\n2 2\n255\n" + " ".join(map(str, a[:2, :2].ravel()))).encode()
    assert np.array_equal(decode_pnm(p3), a[:2, :2])
    # 16-bit big-endian reduces with rounding; small maxval scales up
    g16 = rng.integers(0, 65536, (3, 4)).astype(">u2")
    want = ((g16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(
        decode_pnm(b"P5 4 3 65535\n" + g16.tobytes()),
        np.repeat(want[:, :, None], 3, axis=2),
    )
    out = decode_pnm(b"P2\n2 1\n15\n15 0\n")
    assert out[0, 0, 0] == 255 and out[0, 1, 0] == 0
    with pytest.raises(ValueError, match="not a PGM"):
        decode_pnm(b"P7\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="exceeds maxval"):
        decode_pnm(b"P2\n1 1\n10\n11\n")


def test_tga_shapes():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    for rle in (False, True):
        assert np.array_equal(decode_tga(encode_tga(a, rle=rle)), a), rle
    assert np.array_equal(decode_image(encode_tga(a), "tga"), a)
    flat = np.full((20, 30, 3), 50, np.uint8)
    assert len(encode_tga(flat, rle=True)) < len(encode_tga(flat))
    # grey, top-down (descriptor bit 5), hand-built
    g = rng.integers(0, 256, (6, 9), dtype=np.uint8)
    head = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 9, 6, 8, 0x20
    )
    assert np.array_equal(
        decode_tga(head + g.tobytes()), np.repeat(g[:, :, None], 3, axis=2)
    )
    # 32-bit bottom-up with alpha dropped
    b32 = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    head32 = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 5, 4, 32, 0
    )
    got = decode_tga(head32 + b32.tobytes())
    assert np.array_equal(got, b32[::-1, :, 2::-1])
    with pytest.raises(NotImplementedError, match="color-mapped"):
        decode_tga(
            struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 0, 0, 0, 0, 1, 1, 8, 0)
        )


def test_aiff_roundtrip_and_rates():
    pcm = (
        9000 * np.sin(2 * np.pi * 220 * np.arange(12345) / 16000)
    ).astype(np.int16)
    dec, rate = decode_aiff(encode_aiff(pcm, 16000))
    assert rate == 16000 and np.array_equal(dec[:, 0], pcm)
    st = np.stack([pcm[:100], (-pcm[:100]).astype(np.int16)], axis=1)
    d2, r2 = decode_aiff(encode_aiff(st.astype(np.int16), 44100))
    assert r2 == 44100 and np.array_equal(d2, st)
    # the 80-bit extended float survives every common rate
    for r in (8000, 11025, 22050, 44100, 48000, 96000):
        assert decode_aiff(encode_aiff(pcm[:10], r))[1] == r, r
    # dispatch + sniff
    x, r = decode_audio(encode_aiff(pcm, 22050))
    assert r == 22050 and np.array_equal(x, pcm)
    assert _sniff_head(encode_aiff(pcm)[:12]) == "aiff"
    with pytest.raises(NotImplementedError, match="AIFC"):
        d = bytearray(encode_aiff(pcm[:4]))
        d[8:12] = b"AIFC"
        decode_aiff(bytes(d))


def test_au_roundtrip_and_ulaw_reuse():
    pcm = (
        9000 * np.sin(2 * np.pi * 220 * np.arange(5000) / 8000)
    ).astype(np.int16)
    d, r = decode_au(encode_au(pcm, 8000, "ulaw"))
    assert r == 8000 and np.array_equal(d[:, 0], _ULAW_LUT[ulaw_encode(pcm)])
    d2, r2 = decode_au(encode_au(pcm, 16000, "pcm16"))
    assert r2 == 16000 and np.array_equal(d2[:, 0], pcm)
    # dispatch + sniff + unknown-length (0xFFFFFFFF) data size
    x, r = decode_audio(encode_au(pcm, 8000, "ulaw"))
    assert r == 8000 and len(x) == 5000
    assert _sniff_head(encode_au(pcm)[:12]) == "au"
    raw = bytearray(encode_au(pcm, 8000, "ulaw"))
    struct.pack_into(">I", raw, 8, 0xFFFFFFFF)
    d3, _ = decode_au(bytes(raw))
    assert np.array_equal(d3, d)
    with pytest.raises(NotImplementedError, match="encoding"):
        bad = bytearray(encode_au(pcm[:4], 8000, "pcm16"))
        struct.pack_into(">I", bad, 12, 27)  # ADPCM encoding id
        decode_au(bytes(bad))

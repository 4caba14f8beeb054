"""Progressive JPEG (jpeg_progressive.py): the hard invariant is that
a fully-refined progressive stream decodes BIT-IDENTICALLY to the
baseline encoding of the same image (same quantized coefficients →
same IDCT), across content, subsampling, quality, odd dims, and
restart intervals.  Plus: scan/marker structure, the EOBRUN 0x7FFF
flush, optimal-Huffman validity, single-component (grayscale) scan
plumbing, and an import-probed Pillow interop check."""

import struct

import numpy as np
import pytest

from query_cost_feature_engineering_spark.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from query_cost_feature_engineering_spark.jpeg_progressive import (
    _ac_first_block,
    _BitReader,
    _CountSink,
    _huff_encode_table,
    _optimal_table,
    _scan_ac_first,
    _WriteSink,
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _photo(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return np.clip(
        np.cumsum(rng.normal(0, 3, (h, w, 3)), axis=1) + 128, 0, 255
    ).astype(np.uint8)


def test_progressive_decodes_identical_to_baseline():
    rng = np.random.default_rng(9)
    cases = [
        _photo(64, 80),
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),  # noise
        np.full((32, 32, 3), 77, dtype=np.uint8),  # uniform
        np.where(rng.random((40, 40, 3)) < 0.5, 0, 255).astype(np.uint8),
    ]
    for arr in cases:
        for sub in ("444", "420", "422"):
            for q in (50, 90):
                b = decode_jpeg(encode_jpeg(arr, quality=q, subsampling=sub))
                p = decode_jpeg(  # SOF2 delegation from the baseline API
                    encode_jpeg_progressive(arr, quality=q, subsampling=sub)
                )
                assert np.array_equal(b, p), (arr.shape, sub, q)


def test_progressive_odd_dims_and_subsampled_edge_blocks():
    """h=24 in 420: the luma grid has 3 block rows by component dims
    but 4 by the MCU-padded grid — non-interleaved AC scans must cover
    exactly the component's own blocks (A.2.2)."""
    for shape in ((24, 40), (17, 23), (3, 5), (25, 41)):
        arr = _photo(*shape, seed=shape[0])
        for sub in ("444", "420", "422"):
            b = decode_jpeg(encode_jpeg(arr, quality=85, subsampling=sub))
            p = decode_jpeg(
                encode_jpeg_progressive(arr, quality=85, subsampling=sub)
            )
            assert np.array_equal(b, p), (shape, sub)


def test_progressive_restart_intervals():
    arr = _photo(48, 72, seed=4)
    for sub in ("444", "420"):
        b = decode_jpeg(encode_jpeg(arr, quality=85, subsampling=sub))
        for ri in (1, 3, 7):
            p = encode_jpeg_progressive(
                arr, quality=85, subsampling=sub, restart_interval=ri
            )
            assert b"\xff\xdd" in p  # DRI emitted
            assert p.count(b"\xff\xd0") >= 1  # RST0 present somewhere
            assert np.array_equal(decode_jpeg(p), b), (sub, ri)


def test_progressive_marker_structure_and_size():
    arr = _photo(64, 96, seed=7)
    p = encode_jpeg_progressive(arr, quality=90)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    # SOF2 frame header, no SOF0
    assert b"\xff\xc2" in p and b"\xff\xc0" not in p[:200]
    # the classic script: 10 scans, each with its own SOS
    n_sos = 0
    pos = 2
    while pos < len(p) - 1:
        if p[pos] == 0xFF and p[pos + 1] == 0xDA:
            n_sos += 1
            (ln,) = struct.unpack(">H", p[pos + 2 : pos + 4])
            pos += 2 + ln
        else:
            pos += 1
    assert n_sos == 10
    # optimal per-scan tables → smaller than baseline typical tables
    b = encode_jpeg(arr, quality=90)
    assert len(p) < len(b)


def test_optimal_table_canonical_and_edge_cases():
    """Annex K.2: no symbol gets the all-ones code, lengths fit 16
    bits, count preserved; degenerate one-symbol scans still legal."""
    freq = {i: (i + 1) ** 3 for i in range(40)}
    bits, vals = _optimal_table(freq)
    assert sum(bits) == len(vals) == 40 and max(bits) <= 40
    enc = _huff_encode_table(bits, vals)
    codes = sorted((ln, code) for code, ln in enc.values())
    for ln, code in codes:
        assert code != (1 << ln) - 1  # all-ones reserved
        assert ln <= 16
    # single-symbol scan
    bits1, vals1 = _optimal_table({0x00: 500})
    assert sum(bits1) == 1 and vals1 == [0x00]
    # pathological skew must condense to <= 16-bit lengths
    freq2 = {i: 2**i for i in range(30)}
    bits2, _ = _optimal_table(freq2)
    assert len([b for b in bits2 if b]) and sum(bits2) == 30


def test_eobrun_cap_flush_roundtrip():
    """A >32767-block EOB run must flush at the 0x7FFF cap and still
    decode: 40,000 all-zero blocks with nonzero sentinels at both
    ends, through the real scan encoder and block decoder."""
    n = 40_000
    zz = np.zeros((n, 64), dtype=np.int32)
    zz[0, 5] = 7
    zz[n - 1, 63] = -3
    idxs = list(range(n))
    counter = _CountSink()
    _scan_ac_first(counter, zz, idxs, 1, 63, 0, 0, 0)
    bits, vals = _optimal_table(counter.freq[0])
    writer = _WriteSink({0: _huff_encode_table(bits, vals)})
    _scan_ac_first(writer, zz, idxs, 1, 63, 0, 0, 0)
    data = writer.bw.flush()
    from query_cost_feature_engineering_spark.jpeg import _decode_lut

    atab = _decode_lut(bytes(bits), bytes(vals))
    br = _BitReader(data)
    out = np.zeros((n, 64), dtype=np.int32)
    eobrun = 0
    for i in range(n):
        eobrun = _ac_first_block(br, out, i, 1, 63, 0, atab, eobrun)
    assert np.array_equal(out, zz)


def test_progressive_grayscale_single_component_stream():
    """ns=1 grayscale SOF2 stream (DC first + one AC band scan at
    Al=0), hand-assembled via the module's own scan encoders, decodes
    through the public decode path and matches the baseline IDCT of
    the same coefficients."""
    from query_cost_feature_engineering_spark.jpeg import (
        _ZZ,
        _quality_tables,
        _reconstruct_planes,
    )
    from query_cost_feature_engineering_spark.jpeg_progressive import (
        _scan_dc_first,
    )

    rng = np.random.default_rng(13)
    rows, cols = 3, 4
    zz = np.zeros((rows * cols, 64), dtype=np.int32)
    zz[:, 0] = rng.integers(-40, 40, rows * cols)
    zz[:, 1:8] = rng.integers(-5, 6, (rows * cols, 7))
    qt_l, _ = _quality_tables(90)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
    out += bytes(int(qt_l.ravel()[z]) for z in _ZZ)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, rows * 8, cols * 8, 1)
    out += bytes([1, 0x11, 0])
    scans = [
        ("dc", 0, 0),
        ("ac", 1, 63),
    ]
    for kind, ss, se in scans:
        counter = _CountSink()
        if kind == "dc":
            _scan_dc_first(
                counter, [zz], [0], [(1, 1)], cols, rows, 0, {0: 0}, 0
            )
        else:
            _scan_ac_first(counter, zz, list(range(rows * cols)), ss, se, 0, 0, 0)
        bits, vals = _optimal_table(counter.freq[0])
        writer = _WriteSink({0: _huff_encode_table(bits, vals)})
        if kind == "dc":
            _scan_dc_first(
                writer, [zz], [0], [(1, 1)], cols, rows, 0, {0: 0}, 0
            )
            tc = 0x00
        else:
            _scan_ac_first(writer, zz, list(range(rows * cols)), ss, se, 0, 0, 0)
            tc = 0x10
        out += (
            b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            + bytes([tc]) + bytes(bits) + bytes(vals)
        )
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        out += bytes([ss, se, 0])
        out += writer.bw.flush()
    out += b"\xff\xd9"

    dec = decode_jpeg_progressive(bytes(out))
    want = _reconstruct_planes(
        [zz], [(1, 0x11, 0)], [(1, 1)], [(rows, cols)], {0: qt_l},
        rows * 8, cols * 8, 1,
    )
    assert np.array_equal(dec, want)


def test_progressive_interop_with_pillow_when_present():
    """Cross-decoder conformance — runs only where Pillow exists
    (absent in this container; import-probed)."""
    try:
        from PIL import Image  # noqa: F401
    except Exception:
        pytest.skip("Pillow not installed in this container")
    import io

    from query_cost_feature_engineering_spark.jpeg import psnr

    arr = _photo(40, 56, seed=21)
    # PIL reads our progressive bytes
    pil = np.asarray(
        Image.open(
            io.BytesIO(encode_jpeg_progressive(arr, quality=95))
        ).convert("RGB")
    )
    assert psnr(arr, pil) >= 30.0
    # we read PIL's progressive bytes
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95, progressive=True)
    ours = decode_jpeg(buf.getvalue())
    assert psnr(arr, ours) >= 30.0

"""FLAC codec (query_cost_feature_engineering_spark/flac.py): lossless
roundtrips across content/shape/stereo-mode, real compression on
band-limited audio, CRC-8/CRC-16/MD5 corruption detection, LPC
subframe selection, and decode coverage for stream shapes our encoder
never emits (wasted bits, escaped partitions, partition order > 0)
via hand-built frames."""

import hashlib
import struct

import numpy as np
import pytest

import query_cost_feature_engineering_spark.flac as flacmod
from query_cost_feature_engineering_spark.flac import (
    BitWriter,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def _sine(n=30011, rate=16000.0):
    t = np.arange(n) / rate
    return (
        9000 * np.sin(2 * np.pi * 220 * t)
        + 3000 * np.sin(2 * np.pi * 990 * t)
    ).astype(np.int16)


def test_flac_lossless_roundtrips():
    rng = np.random.default_rng(7)
    sig = _sine()
    data = encode_flac(sig, 16000)
    dec, rate = decode_flac(data)
    assert rate == 16000 and np.array_equal(dec[:, 0], sig)
    assert len(data) < 0.8 * sig.nbytes  # real compression
    # white noise is near-incompressible but must stay lossless
    nz = (rng.standard_normal(5000) * 12000).astype(np.int16)
    dd, _ = decode_flac(encode_flac(nz, 8000))
    assert np.array_equal(dd[:, 0], nz)
    # silence: CONSTANT subframes, tiny file
    z = np.zeros(10000, dtype=np.int16)
    zd = encode_flac(z)
    assert np.array_equal(decode_flac(zd)[0][:, 0], z) and len(zd) < 120
    # int16 extremes and a non-multiple-of-4096 tail block
    ex = np.array([-32768, 32767, 0, -1, 1] * 100, dtype=np.int16)
    assert np.array_equal(decode_flac(encode_flac(ex))[0][:, 0], ex)
    odd = sig[:4097]
    assert np.array_equal(decode_flac(encode_flac(odd))[0][:, 0], odd)
    # empty stream
    e, r = decode_flac(encode_flac(np.empty(0, dtype=np.int16), 22050))
    assert e.shape == (0, 1) and r == 22050


def test_flac_stereo_modes_lossless():
    sig = _sine(9001)
    rng = np.random.default_rng(3)
    right = (sig // 2 + (rng.standard_normal(9001) * 800).astype(np.int16)).astype(
        np.int16
    )
    st = np.stack([sig, right], axis=1)
    for mode in ("independent", "mid-side", "auto"):
        dec, rate = decode_flac(encode_flac(st, 44100, stereo_mode=mode))
        assert rate == 44100 and np.array_equal(dec, st), mode
    with pytest.raises(ValueError, match="stereo_mode"):
        encode_flac(st, 44100, stereo_mode="left-side")
    with pytest.raises(NotImplementedError, match="mono/stereo"):
        encode_flac(np.zeros((10, 3), dtype=np.int16))


def test_flac_corruption_detected():
    sig = _sine(5000)
    data = bytearray(encode_flac(sig, 16000))
    # STREAMINFO block is 4 (magic) + 4 (block header) + 34 bytes; the
    # first frame starts right after. Flip a byte deep in frame payload:
    i = len(data) - 40
    data[i] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(data))
    # corrupt the stored MD5 only
    data = bytearray(encode_flac(sig, 16000))
    data[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data))
    # corrupt a frame-header byte (hits CRC-8 before CRC-16)
    data = bytearray(encode_flac(sig, 16000))
    data[42 + 2] ^= 0x01  # frame starts at 42; byte 2 is in the header
    with pytest.raises(ValueError):
        decode_flac(bytes(data))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"NOPE" + bytes(100))


def test_flac_lpc_subframe_used_and_decoded(monkeypatch):
    """A pure sine is strongly autocorrelated: the order-2 LPC
    candidate must beat the fixed predictors for at least one block,
    and the LPC decode path must reconstruct exactly."""
    t = np.arange(8192) / 16000.0
    sig = (12000 * np.sin(2 * np.pi * 441.3 * t)).astype(np.int16)
    data = encode_flac(sig, 16000)
    seen = []
    orig = flacmod._read_subframe

    def spy(r, n, bps):
        # record the subframe type bits without consuming them twice
        pos_acc, pos_nbits, pos_byte = r.acc, r.nbits, r.bytepos
        r.read(1)
        seen.append(r.read(6))
        r.acc, r.nbits, r.bytepos = pos_acc, pos_nbits, pos_byte
        return orig(r, n, bps)

    monkeypatch.setattr(flacmod, "_read_subframe", spy)
    dec, _ = decode_flac(data)
    assert np.array_equal(dec[:, 0], sig)
    assert any(s & 0b100000 for s in seen), f"no LPC subframe in {seen}"


def _handmade_stream(payload_writer, n, rate=8000):
    """Build a one-frame mono 16-bit FLAC stream whose single subframe
    is written by payload_writer(BitWriter) — lets tests exercise
    decode paths the encoder never produces."""
    si = BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    si.align()
    meta = si.getvalue() + b"\x00" * 16  # MD5 zero = unverified, per spec
    head = b"fLaC" + bytes([0x80]) + len(meta).to_bytes(3, "big") + meta
    hdr = BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)  # 16-bit block size at end
    hdr.write(0, 4)  # rate from STREAMINFO
    hdr.write(0, 4)  # mono
    hdr.write(0b100, 3)  # 16 bps
    hdr.write(0, 1)
    hdr.write(0, 8)  # frame number 0
    hdr.write(n - 1, 16)
    hdr.align()
    hbytes = hdr.getvalue()
    w = BitWriter()
    for b in hbytes:
        w.write(b, 8)
    w.write(crc8(hbytes), 8)
    payload_writer(w)
    w.align()
    body = w.getvalue()
    return head + body + struct.pack(">H", crc16(body))


def test_flac_decode_wasted_bits():
    """VERBATIM subframe with 1 wasted bit: samples stored >>1 at 15
    bits, decoder must shift back."""
    vals = np.array([-4096, 2048, 0, 8190, -2], dtype=np.int16)  # all even

    def payload(w):
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(1, 1)  # wasted-bits flag
        w.write(1, 1)  # unary 0 zeroes -> wasted = 1
        for v in (vals.astype(np.int64) >> 1).tolist():
            w.write(int(v), 15)

    dec, rate = decode_flac(_handmade_stream(payload, len(vals)))
    assert rate == 8000 and np.array_equal(dec[:, 0], vals)


def test_flac_decode_escaped_and_partitioned_residual():
    """FIXED(0) subframe, Rice partition order 1 where partition 0 is
    rice-coded (param 2) and partition 1 is an ESCAPE partition with
    6-bit verbatim residuals."""
    n = 8
    first = [3, -2, 1, 0]  # partition 0 (param 2)
    second = [-31, 17, 5, -9]  # partition 1 (escape, 6-bit)
    expect = np.array(first + second, dtype=np.int16)

    def payload(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)  # method 00 (4-bit rice)
        w.write(1, 4)  # partition order 1 -> 2 partitions of 4
        w.write(2, 4)  # partition 0 param
        for e in first:
            u = (e << 1) if e >= 0 else ((-e) << 1) - 1
            w.write_unary(u >> 2)
            w.write(u & 3, 2)
        w.write(0xF, 4)  # partition 1: escape
        w.write(6, 5)  # 6-bit raw residuals
        for e in second:
            w.write(e & 0x3F, 6)

    dec, _ = decode_flac(_handmade_stream(payload, n))
    assert np.array_equal(dec[:, 0], expect)


def test_flac_dispatch_via_decode_audio():
    from query_cost_feature_engineering_spark.functions.multimodal import (
        decode_audio,
    )

    sig = _sine(4444)
    pcm, rate = decode_audio(encode_flac(sig, 16000))
    assert rate == 16000 and np.array_equal(pcm, sig)


def test_flac_md5_is_spec_md5():
    """STREAMINFO bytes 18:34 hold MD5 of the raw interleaved
    little-endian PCM — checkable with hashlib alone (independent of
    the decoder)."""
    sig = _sine(2048)
    data = encode_flac(sig, 16000)
    md5 = data[8 + 18 : 8 + 34]
    assert md5 == hashlib.md5(sig[:, None].astype("<i2").tobytes()).digest()


def test_flac_decode_fixed_high_orders():
    """FIXED(3) and FIXED(4) subframes (our encoder stops at order 2):
    the k-fold cumsum inversion must reproduce the exact samples."""
    rng = np.random.default_rng(11)
    x = rng.integers(-1000, 1000, 64).astype(np.int64)

    for order in (3, 4):
        resid = x.copy()
        for _ in range(order):
            resid = np.diff(resid)

        def payload(w, order=order, resid=resid):
            w.write(0, 1)
            w.write(0b001000 | order, 6)
            w.write(0, 1)
            for v in x[:order].tolist():
                w.write(int(v), 16)
            w.write(0, 2)  # 4-bit rice
            w.write(0, 4)  # partition order 0
            w.write(11, 4)  # big param: residuals fit
            for e in resid.tolist():
                u = (e << 1) if e >= 0 else ((-e) << 1) - 1
                w.write_unary(u >> 11)
                w.write(u & ((1 << 11) - 1), 11)

        dec, _ = decode_flac(_handmade_stream(payload, len(x)))
        assert np.array_equal(dec[:, 0], x.astype(np.int16)), order

"""FLAC (Free Lossless Audio Codec) — a REAL lossless compressed audio
codec in pure stdlib + NumPy, written against the public format spec
(xiph.org/flac/format.html; RFC 9639).  No codec library is involved:
the container (STREAMINFO + frames), the bit-level entropy layer
(Rice/Golomb residual coding), both CRCs (CRC-8 header, CRC-16 frame)
and the STREAMINFO MD5 of the raw samples are all implemented here.

Subset support, honestly scoped:

* encode — 16-bit mono/stereo, fixed 4096-sample blocks, CONSTANT /
  VERBATIM / FIXED(0-2) / LPC(order 2, Levinson-free autocorrelation
  solve) subframes chosen per block by estimated cost, Rice partition
  order 0, independent or mid-side stereo.
* decode — CONSTANT / VERBATIM / FIXED(0-4) / LPC(any order) subframes,
  all four channel assignments (independent, left-side, right-side,
  mid-side), wasted-bits, Rice + Rice2 + escaped partitions at any
  partition order; CRC-8, CRC-16 and the stream MD5 are verified and
  mismatches raise.

Losslessness is the hard self-check: decode(encode(x)) must equal x
bit-for-bit, and the MD5 in STREAMINFO independently pins the decoded
stream against the encoder's input.  Feature parity target: the
reference pipeline's audio feature rows (see sources/media.py corpus),
reference repo has no audio path — this extends the multimodal surface
the same way the JPEG/AVI/MP4 codecs do for images/video.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# ---------------------------------------------------------------------------
# CRCs (FLAC uses CRC-8 poly 0x07 for frame headers, CRC-16 poly 0x8005
# for whole frames, both init 0, no reflection).
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tab[i] = c & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TAB[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# Bit I/O.  Encoder appends into a growing int accumulator flushed per
# byte; decoder keeps a 64-bit-ish cache refilled bytewise.  Clips in
# the corpus are <= 48k samples, so per-symbol Python costs stay small
# (same budget class as the IMA ADPCM loop in codecs.py).
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


class BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, bits: int) -> int:
        while self.nbits < bits:
            if self.bytepos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.bytepos]
            self.bytepos += 1
            self.nbits += 8
        self.nbits -= bits
        v = (self.acc >> self.nbits) & ((1 << bits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        self.acc &= (1 << self.nbits) - 1

    def tell_aligned(self) -> int:
        assert self.nbits % 8 == 0
        return self.bytepos - self.nbits // 8


# ---------------------------------------------------------------------------
# Frame-number UTF-8-style coding (FLAC reuses the UTF-8 length
# prefixes for 31-bit frame numbers).
# ---------------------------------------------------------------------------


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 + 5 * (nbytes - 1))) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(r: BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    probe = b0
    while probe & 0x80:
        nbytes += 1
        probe = (probe << 1) & 0xFF
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


# ---------------------------------------------------------------------------
# Rice residual coding (partition order 0 on encode; any on decode).
# ---------------------------------------------------------------------------


def _zigzag(e: np.ndarray) -> np.ndarray:
    e = e.astype(np.int64)
    return np.where(e >= 0, e << 1, ((-e) << 1) - 1)


def _best_rice_param(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    mean = float(u.mean())
    p = 0
    while (1 << (p + 1)) <= mean + 1 and p < 14:
        p += 1
    # local refine: exact cost at p-1, p, p+1
    best_p, best_c = p, None
    for cand in (p - 1, p, p + 1):
        if cand < 0 or cand > 14:
            continue
        c = int((u >> cand).sum()) + len(u) * (1 + cand)
        if best_c is None or c < best_c:
            best_p, best_c = cand, c
    return best_p


def _write_residual(w: BitWriter, resid: np.ndarray) -> None:
    """Coding method 00 (4-bit Rice), partition order 0."""
    w.write(0, 2)
    w.write(0, 4)
    u = _zigzag(resid)
    p = _best_rice_param(u)
    w.write(p, 4)
    if p:
        q = (u >> p).tolist()
        rem = (u & ((1 << p) - 1)).tolist()
        for qi, ri in zip(q, rem):
            w.write_unary(qi)
            w.write(ri, p)
    else:
        for qi in u.tolist():
            w.write_unary(qi)


def _read_residual(
    r: BitReader, block_size: int, pred_order: int
) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise ValueError("partition count does not divide block size")
    out = np.empty(block_size - pred_order, dtype=np.int64)
    oi = 0
    for part in range(nparts):
        n = block_size >> part_order
        if part == 0:
            n -= pred_order
        p = r.read(plen)
        if p == escape:
            bps = r.read(5)
            for i in range(n):
                out[oi] = r.read_signed(bps) if bps else 0
                oi += 1
        else:
            # inlined hot loop: locals for the bit cache beat method
            # dispatch ~4x on long partitions
            acc, nbits = r.acc, r.nbits
            data, bytepos, dlen = r.data, r.bytepos, len(r.data)
            for i in range(n):
                q = 0
                while True:
                    if nbits == 0:
                        if bytepos >= dlen:
                            raise ValueError("FLAC bitstream truncated")
                        acc = data[bytepos]
                        bytepos += 1
                        nbits = 8
                    if acc == 0:  # whole cache is zeros
                        q += nbits
                        nbits = 0
                        continue
                    top = acc >> (nbits - 1)
                    if top:
                        nbits -= 1
                        acc &= (1 << nbits) - 1
                        break
                    # skip leading zeros in one step
                    z = nbits - acc.bit_length()
                    q += z
                    nbits -= z
                while nbits < p:
                    if bytepos >= dlen:
                        raise ValueError("FLAC bitstream truncated")
                    acc = (acc << 8) | data[bytepos]
                    bytepos += 1
                    nbits += 8
                if p:
                    nbits -= p
                    u = (q << p) | (acc >> nbits)
                    acc &= (1 << nbits) - 1
                else:
                    u = q
                out[oi] = (u >> 1) ^ -(u & 1)  # un-zigzag
                oi += 1
            r.acc, r.nbits, r.bytepos = acc, nbits, bytepos
    return out


# ---------------------------------------------------------------------------
# Subframes.
# ---------------------------------------------------------------------------

_FIXED_COEFFS = {  # prediction from previous samples, per spec
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_order2(x: np.ndarray) -> tuple[list[int], int] | None:
    """Order-2 LPC via the 2x2 autocorrelation normal equations,
    quantized to 12-bit precision.  Returns (coeffs, shift) or None
    when the block is degenerate (constant / too short)."""
    xf = x.astype(np.float64)
    n = len(xf)
    if n < 8:
        return None
    r0 = float(xf @ xf)
    if r0 == 0.0:
        return None
    r1 = float(xf[1:] @ xf[:-1])
    r2 = float(xf[2:] @ xf[:-2])
    det = r0 * r0 - r1 * r1
    if abs(det) < 1e-9 * r0 * r0:
        return None
    a1 = (r1 * r0 - r1 * r2) / det
    a2 = (r2 * r0 - r1 * r1) / det
    shift = 12
    q1 = int(round(a1 * (1 << shift)))
    q2 = int(round(a2 * (1 << shift)))
    lim = (1 << 14) - 1  # 15-bit signed precision
    if not (-lim <= q1 <= lim and -lim <= q2 <= lim):
        return None
    if q1 == 0 and q2 == 0:
        return None
    return [q1, q2], shift


def _lpc_residual(
    x: np.ndarray, coeffs: list[int], shift: int
) -> np.ndarray:
    xi = x.astype(np.int64)
    order = len(coeffs)
    pred = np.zeros(len(xi) - order, dtype=np.int64)
    for j, c in enumerate(coeffs):
        pred += c * xi[order - 1 - j : len(xi) - 1 - j]
    return xi[order:] - (pred >> shift)


def _write_subframe(w: BitWriter, x: np.ndarray, bps: int) -> None:
    """Choose CONSTANT / FIXED(0-2) / LPC(2) / VERBATIM by estimated
    Rice cost and emit the cheapest."""
    n = len(x)
    if n and np.all(x == x[0]):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    candidates: list[tuple[int, str, object]] = []
    for order in (0, 1, 2):
        if n <= order:
            continue
        resid = _fixed_residual(x, order)
        u = _zigzag(resid)
        p = _best_rice_param(u)
        cost = order * bps + int((u >> p).sum()) + len(u) * (1 + p)
        candidates.append((cost, "fixed", (order, resid)))
    lpc = _lpc_order2(x)
    if lpc is not None:
        coeffs, shift = lpc
        resid = _lpc_residual(x, coeffs, shift)
        u = _zigzag(resid)
        p = _best_rice_param(u)
        cost = (
            2 * bps + 4 + 5 + 2 * 15
            + int((u >> p).sum()) + len(u) * (1 + p)
        )
        candidates.append((cost, "lpc", (coeffs, shift, resid)))
    candidates.sort(key=lambda t: t[0])
    cost, kind, info = candidates[0]
    if cost > n * bps:  # incompressible: VERBATIM
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in x.tolist():
            w.write(int(v), bps)
        return
    if kind == "fixed":
        order, resid = info
        w.write(0, 1)
        w.write(0b001000 | order, 6)
        w.write(0, 1)
        for v in x[:order].tolist():
            w.write(int(v), bps)
        _write_residual(w, resid)
    else:
        coeffs, shift, resid = info
        order = len(coeffs)
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for v in x[:order].tolist():
            w.write(int(v), bps)
        w.write(15 - 1, 4)  # precision-1 (15-bit coeffs)
        w.write(shift, 5)
        for c in coeffs:
            w.write(c, 15)
        _write_residual(w, resid)


def _read_subframe(r: BitReader, n: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe header pad bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        v = r.read_signed(bps)
        out = np.full(n, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif (t & 0b111000) == 0b001000:  # FIXED
        order = t & 0b000111
        if order > 4:
            raise ValueError(f"reserved FIXED order {order}")
        warm = np.array(
            [r.read_signed(bps) for _ in range(order)], dtype=np.int64
        )
        resid = _read_residual(r, n, order)
        # invert the k-fold difference with k cumsums (vectorized):
        # D_k = resid; D_{j-1} = cumsum([diff^{j-1}(warm)[-1], D_j])
        out = resid
        for j in range(order, 0, -1):
            seed = np.diff(warm[:j], j - 1)[-1] if j > 1 else warm[0]
            out = np.cumsum(np.concatenate(([seed], out)))
        # after k cumsums `out` has length n and includes the warmups
    elif t & 0b100000:  # LPC
        order = (t & 0b011111) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * out[i - 1 - j]
            out[i] = (pred >> shift) + resid[i - order]
    else:
        raise ValueError(f"reserved subframe type {t:#08b}")
    if wasted:
        out <<= wasted
    return out


# ---------------------------------------------------------------------------
# Stream encode / decode.
# ---------------------------------------------------------------------------

_BLOCK = 4096


def encode_flac(
    pcm: np.ndarray,
    rate: int = 16000,
    block_size: int = _BLOCK,
    stereo_mode: str = "auto",
) -> bytes:
    """(n,) or (n, ch<=2) int16 → FLAC bytes.  ``stereo_mode`` is
    'independent', 'mid-side', or 'auto' (per-block cheaper of the
    two, like real encoders)."""
    if pcm.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    if ch not in (1, 2):
        raise NotImplementedError("only mono/stereo FLAC encode")
    if stereo_mode not in ("auto", "independent", "mid-side"):
        raise ValueError(f"bad stereo_mode {stereo_mode!r}")
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    frames = bytearray()
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = pcm[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        # --- frame header ---
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        # block size code: common power codes, else 16-bit at end
        bs_code, bs_tail = 0b0111, bs - 1
        for code, size in (
            (0b1100, 4096), (0b1011, 2048), (0b1010, 1024),
            (0b1001, 512), (0b1000, 256), (0b0001, 192),
        ):
            if bs == size:
                bs_code, bs_tail = code, None
                break
        hdr.write(bs_code, 4)
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        use_ms = False
        if ch == 2 and stereo_mode != "independent":
            mid = (blk[:, 0].astype(np.int64) + blk[:, 1]) >> 1
            side = blk[:, 0].astype(np.int64) - blk[:, 1]
            if stereo_mode == "mid-side":
                use_ms = True
            else:  # auto: crude cost proxy — mean |2nd diff|
                def c2(v):
                    return float(np.abs(np.diff(v, 2)).mean()) if len(v) > 2 else 0.0
                use_ms = c2(mid) + c2(side) < c2(blk[:, 0]) + c2(blk[:, 1])
        hdr.write(0b1010 if use_ms else ch - 1, 4)
        hdr.write(0b100, 3)  # 16 bps
        hdr.write(0, 1)
        for b in _utf8_encode(frame_no):
            hdr.write(b, 8)
        if bs_tail is not None:
            hdr.write(bs_tail, 16)
        hdr.align()
        hbytes = hdr.getvalue()
        w = BitWriter()
        for b in hbytes:
            w.write(b, 8)
        w.write(crc8(hbytes), 8)
        # --- subframes ---
        if use_ms:
            _write_subframe(w, mid, 16)
            _write_subframe(w, side, 17)  # side channel carries bps+1
        else:
            for c in range(ch):
                _write_subframe(w, blk[:, c].astype(np.int64), 16)
        w.align()
        body = w.getvalue()
        frames += body + struct.pack(">H", crc16(body))
        frame_no += 1
    # --- STREAMINFO ---
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)  # bps-1
    si.write(n, 36)
    si.align()
    meta = si.getvalue() + md5
    head = FLAC_MAGIC + bytes([0x80]) + len(meta).to_bytes(3, "big") + meta
    return head + bytes(frames)


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ((n, ch) int16, rate).  Verifies CRC-8 per frame
    header, CRC-16 per frame, and the STREAMINFO MD5 over the decoded
    stream; any mismatch raises ValueError."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = ch = bps = None
    total = md5_want = None
    last = False
    while not last:
        btype = data[pos]
        last = bool(btype & 0x80)
        btype &= 0x7F
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        payload = data[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if btype == 0:  # STREAMINFO
            r = BitReader(payload)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5_want = payload[18:34]
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    if bps != 16:
        raise NotImplementedError(f"only 16-bit FLAC decode (bps={bps})")
    chunks: list[np.ndarray] = []
    got = 0
    while pos < len(data) and (total is None or total == 0 or got < total):
        fstart = pos
        r = BitReader(data, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {fstart}")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _utf8_decode(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        if ss_code not in (0b000, 0b100):
            raise NotImplementedError("only 16-bit frames supported")
        hdr_end = r.tell_aligned()
        want8 = r.read(8)
        if crc8(data[fstart:hdr_end]) != want8:
            raise ValueError(f"frame header CRC-8 mismatch at byte {fstart}")
        if ch_code < 8:
            nch = ch_code + 1
            cols = [_read_subframe(r, bs, 16) for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(r, bs, 16)
            side = _read_subframe(r, bs, 17)
            cols = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _read_subframe(r, bs, 17)
            right = _read_subframe(r, bs, 16)
            cols = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(r, bs, 16)
            side = _read_subframe(r, bs, 17)
            mid = (mid << 1) | (side & 1)
            cols = [(mid + side) >> 1, (mid - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        r.align()
        body_end = r.tell_aligned()
        (want16,) = struct.unpack(">H", data[body_end : body_end + 2])
        if crc16(data[fstart:body_end]) != want16:
            raise ValueError(f"frame CRC-16 mismatch at byte {fstart}")
        pos = body_end + 2
        frame = np.stack(cols, axis=1)
        if frame.min() < -32768 or frame.max() > 32767:
            raise ValueError("decoded sample out of int16 range")
        chunks.append(frame.astype(np.int16))
        got += bs
    pcm = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.empty((0, ch), dtype=np.int16)
    )
    if total:
        pcm = pcm[:total]
    if md5_want and md5_want != b"\x00" * 16:
        if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != md5_want:
            raise ValueError("FLAC stream MD5 mismatch")
    return pcm, int(rate)

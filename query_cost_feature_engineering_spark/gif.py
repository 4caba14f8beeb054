"""GIF (GIF89a) — encode and decode in pure stdlib + NumPy, written
against the public specification (CompuServe GIF89a, 1990; W3C notes).
GIF completes the web image triad (JPEG/PNG/GIF) for the multimodal
decode surface, and animated GIFs double as a real video-ish format
for the frame-sampling path.

* encode — ``encode_gif``: single frame or animation from paletted
  RGB content (≤256 distinct colors; lossless by construction),
  variable-width LSB-first LZW with dictionary reset at 4096 codes,
  255-byte sub-block framing, optional Adam-style 4-pass interlace,
  per-frame graphic-control extensions (delay, optional transparency)
  and the NETSCAPE2.0 loop extension for animations.
* decode — ``decode_gif``: full block walk (extensions skipped by
  sub-block framing), global AND local color tables, interlaced
  images, frame regions smaller than the logical screen, transparency
  compositing, and disposal methods 0/1 (leave), 2 (restore to
  background) and 3 (restore to previous).  Returns the composited
  (n, h, w, 3) frame stack plus per-frame delays in centiseconds.

Lossless roundtrips on paletted content are the hard self-check, and
the test suite pins decode-only shapes (interlace, local tables,
partial-rect frames, transparency, each disposal mode) with
independently hand-composited references.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes).
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """Index stream → GIF LZW bytes (without sub-block framing)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    prev = b""
    for v in indices.tolist():
        b = bytes([v])
        cur = prev + b
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        prev = b
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> np.ndarray:
    """GIF LZW bytes (sub-blocks already joined) → index array."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError(
            f"GIF pixel data short: {len(out)} of {n_expected}"
        )
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# Encoder.
# ---------------------------------------------------------------------------


def _build_palette(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n,h,w,3) → (palette (k,3), indices (n,h,w)); ≤256 colors only
    (GIF is a paletted format — quantization is a separate concern)."""
    flat = frames.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"GIF encode needs <= 256 distinct colors, got {len(pal)}"
        )
    return pal.astype(np.uint8), inv.reshape(frames.shape[:-1]).astype(np.uint8)


def encode_gif(
    frames: np.ndarray,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    loop: int = 0,
) -> bytes:
    """(h, w, 3) or (n, h, w, 3) uint8 RGB (≤256 distinct colors) →
    GIF89a bytes.  Animations carry per-frame GCE delays (centisec)
    and a NETSCAPE2.0 loop block; single frames omit both."""
    if frames.dtype != np.uint8 or frames.ndim not in (3, 4):
        raise ValueError("encode_gif expects (h,w,3) or (n,h,w,3) uint8")
    single = frames.ndim == 3
    if single:
        frames = frames[None]
    n, h, w = frames.shape[:3]
    pal, idx = _build_palette(frames)
    size_bits = max(1, int(len(pal) - 1).bit_length())
    gct = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    gct[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += gct.tobytes()
    if not single:
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += bytes([3, 1]) + struct.pack("<H", loop) + b"\x00"
    mcs = max(2, size_bits)
    for f in range(n):
        if not single:
            d = delays_cs[f] if delays_cs else 10
            out += b"\x21\xf9" + bytes([4, 0]) + struct.pack("<H", d)
            out += bytes([0, 0])  # no transparency, block end
        flags = (0x40 if interlace else 0x00)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([flags])
        rows = idx[f]
        if interlace:
            rows = rows[_interlace_order(h)]
        out += bytes([mcs]) + _subblocks(_lzw_encode(rows.ravel(), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder.
# ---------------------------------------------------------------------------


def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → ((n, h, w, 3) uint8 composited frames, delays in
    centiseconds — 0 for frames without a GCE)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        k = 2 << (packed & 0x07)
        gct = np.frombuffer(
            data, dtype=np.uint8, count=k * 3, offset=pos
        ).reshape(k, 3)
        pos += k * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    bg_rgb = None
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
        canvas[:] = bg_rgb
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state (applies to the NEXT image block)
    disposal = 0
    transparent: int | None = None
    delay = 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = data[pos]
                gpk, delay = struct.unpack("<BH", data[pos + 1 : pos + 4])
                tidx = data[pos + 4]
                disposal = (gpk >> 2) & 0x7
                transparent = tidx if gpk & 1 else None
                pos += 1 + sz
                if data[pos] != 0:
                    raise ValueError("unterminated GCE")
                pos += 1
            else:  # comment / plain-text / application: skip sub-blocks
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
        elif b0 == 0x2C:  # image descriptor
            left, top, iw, ih, ipk = struct.unpack(
                "<HHHHB", data[pos : pos + 9]
            )
            pos += 9
            table = gct
            if ipk & 0x80:  # local color table
                k = 2 << (ipk & 0x07)
                table = np.frombuffer(
                    data, dtype=np.uint8, count=k * 3, offset=pos
                ).reshape(k, 3)
                pos += k * 3
            if table is None:
                raise ValueError("GIF image with no color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), mcs, iw * ih).reshape(ih, iw)
            if ipk & 0x40:  # interlaced: invert the 4-pass row order
                order = _interlace_order(ih)
                de = np.empty_like(idx)
                de[order] = idx
                idx = de
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("GIF color index out of range")
            prev_canvas = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + ih, left : left + iw]
            rgb = table[idx]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:  # restore region to background
                canvas[top : top + ih, left : left + iw] = (
                    bg_rgb if bg_rgb is not None else 0
                )
            elif disposal == 3 and prev_canvas is not None:
                canvas = prev_canvas
            disposal = 0
            transparent = None
            delay = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays

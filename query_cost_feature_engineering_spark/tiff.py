"""TIFF (baseline, TIFF 6.0) — encode and decode in pure stdlib +
NumPy, written against the public Adobe TIFF 6.0 specification (1992).
TIFF is the interchange format of scanned datasets and scientific
imagery; baseline-plus-LZW covers the overwhelming majority of real
files.

* decode — ``decode_tiff``: both byte orders (II/MM), strip-based
  chunky (PlanarConfiguration=1) images; Compression 1 (none),
  32773 (PackBits) and 5 (LZW — the TIFF variant: MSB-first bit
  packing, 9..12-bit codes with the spec's "early change", ClearCode
  256) with Predictor 2 (horizontal differencing); photometric 0/1
  (grayscale, including MinIsWhite inversion), 2 (RGB, extra samples
  such as alpha dropped) and 3 (palette via the 16-bit ColorMap);
  8- and 16-bit samples (16-bit reduced to the high byte).  Tiled
  images, planar configuration 2, and other compressions raise.
* encode — ``encode_tiff``: 8-bit RGB, little-endian, single or
  multiple strips, compression 'none' / 'packbits' / 'lzw' (with
  horizontal predictor) — enough to roundtrip-test every decode path
  and write real files any TIFF reader opens.

The hard check is losslessness: every compression/predictor
combination must roundtrip bit-exactly, and PackBits/LZW are
additionally pinned by spec-derived literal vectors in the tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9 / classic Apple PackBits).
# ---------------------------------------------------------------------------


def packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(row[i])
            i = j
            continue
        # literal stretch: until a >=3 run starts (2-runs are cheaper
        # inside a literal than breaking it)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_expected:
        if i >= len(data):
            raise ValueError("PackBits stream truncated")
        c = data[i]
        i += 1
        if c < 128:  # literal of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op, per spec
    return bytes(out[:n_expected])


# ---------------------------------------------------------------------------
# TIFF LZW (spec §13): MSB-first, ClearCode=256, EOI=257, early change.
# ---------------------------------------------------------------------------


def lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR, width)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # EARLY CHANGE: widen when next_code == 2^width - 1 (spec §13)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code >= 4094 and width == 12:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, n_expected: int) -> bytes:
    CLEAR, EOI = 256, 257
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < n_expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # early change on DECODE: the decoder's table runs one entry
        # behind the encoder's next-free counter at the same stream
        # position, so mirroring the encoder's widen-at-(2^w - 1)
        # means widening here at len == 2^w - 2 (e.g. the code after
        # entry 510 is created is already 10 bits — TIFF 6.0 §13's
        # documented off-by-one, kept for compatibility)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < n_expected:
        raise ValueError(f"TIFF pixel data short: {len(out)}/{n_expected}")
    return bytes(out[:n_expected])


# ---------------------------------------------------------------------------
# IFD plumbing.
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_FMT = {3: "H", 4: "I"}


def _read_tag_values(data: bytes, e: str, typ: int, cnt: int, raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * cnt
    buf = raw[:4] if total <= 4 else data[struct.unpack(e + "I", raw)[0] :]
    if typ in (3, 4):
        return list(struct.unpack_from(e + _TYPE_FMT[typ] * cnt, buf))
    if typ == 1:
        return list(buf[:cnt])
    return None


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (h, w, 3) uint8 RGB (first IFD)."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    if struct.unpack(e + "H", data[2:4])[0] != 42:
        raise ValueError("bad TIFF magic")
    (ifd,) = struct.unpack(e + "I", data[4:8])
    (n,) = struct.unpack(e + "H", data[ifd : ifd + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", data[off : off + 8])
        vals = _read_tag_values(data, e, typ, cnt, data[off + 8 : off + 12])
        if vals is not None:
            tags[tag] = vals
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF")
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    rps = tags.get(278, [h])[0]
    if planar != 1:
        raise NotImplementedError("planar configuration 2")
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(f"bits per sample {bits}")
    bps = bits[0]
    nb = bps // 8

    raw = bytearray()
    rows_left = h
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rps, rows_left)
        rows_left -= strip_rows
        expect = strip_rows * w * spp * nb
        chunk = data[off : off + cnt]
        if comp == 1:
            dec = bytes(chunk[:expect])
            if len(dec) < expect:
                raise ValueError("TIFF strip short")
        elif comp == 32773:
            dec = packbits_decode(chunk, expect)
        elif comp == 5:
            dec = lzw_decode(chunk, expect)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
        raw += dec
    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w * spp * nb)
    if predictor == 2:
        if bps != 8:
            raise NotImplementedError("predictor on 16-bit samples")
        arr = np.cumsum(
            arr.reshape(h, w, spp).astype(np.uint16), axis=1, dtype=np.uint16
        ).astype(np.uint8).reshape(h, w * spp)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if bps == 16:
        be = e == ">"
        pix = arr.reshape(h, w, spp, 2)[:, :, :, 0 if be else 1]
    else:
        pix = arr.reshape(h, w, spp)
    if photo in (0, 1):
        g = pix[:, :, 0]
        if photo == 0:  # MinIsWhite
            g = (255 - g.astype(np.int16)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples")
        return np.ascontiguousarray(pix[:, :, :3])
    if photo == 3:
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        k = len(cmap) // 3
        pal = (np.asarray(cmap, dtype=np.uint32).reshape(3, k).T >> 8).astype(
            np.uint8
        )
        idx = pix[:, :, 0]
        if int(idx.max(initial=0)) >= k:
            raise ValueError("TIFF palette index out of range")
        return pal[idx]
    raise NotImplementedError(f"TIFF photometric {photo}")


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → little-endian baseline TIFF bytes;
    ``compression``: 'none', 'packbits', or 'lzw' (with horizontal
    predictor 2, the standard pairing)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_tiff expects (h, w, 3) uint8")
    comps = {"none": 1, "packbits": 32773, "lzw": 5}
    if compression not in comps:
        raise ValueError(f"compression must be one of {sorted(comps)}")
    h, w = arr.shape[:2]
    rps = rows_per_strip or h
    pred = 2 if compression == "lzw" else 1
    strips = []
    for y0 in range(0, h, rps):
        block = arr[y0 : y0 + rps]
        if pred == 2:
            d = block.astype(np.int16)
            d[:, 1:] -= block[:, :-1].astype(np.int16)
            block = (d & 0xFF).astype(np.uint8)
        row = block.tobytes()
        if compression == "none":
            strips.append(row)
        elif compression == "packbits":
            strips.append(packbits_encode(row))
        else:
            strips.append(lzw_encode(row))
    n_strips = len(strips)

    def tag(t, typ, vals):
        return (t, typ, vals)

    # layout: header (8) + pixel strips + IFD + overflow arrays
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    entries = [
        tag(256, 4, [w]),
        tag(257, 4, [h]),
        tag(258, 3, [8, 8, 8]),
        tag(259, 3, [comps[compression]]),
        tag(262, 3, [2]),
        tag(273, 4, offsets),
        tag(277, 3, [3]),
        tag(278, 4, [rps]),
        tag(279, 4, [len(s) for s in strips]),
        tag(284, 3, [1]),
    ]
    if pred == 2:
        entries.append(tag(317, 3, [pred]))
    entries.sort(key=lambda t: t[0])
    ifd_off = pos
    ifd_size = 2 + 12 * len(entries) + 4
    over_off = ifd_off + ifd_size
    ifd = struct.pack("<H", len(entries))
    overflow = bytearray()
    for t, typ, vals in entries:
        fmt = _TYPE_FMT[typ]
        payload = struct.pack("<" + fmt * len(vals), *vals)
        if len(payload) <= 4:
            raw = payload + b"\x00" * (4 - len(payload))
        else:
            raw = struct.pack("<I", over_off + len(overflow))
            overflow += payload
        ifd += struct.pack("<HHI", t, typ, len(vals)) + raw
    ifd += struct.pack("<I", 0)  # no next IFD
    return (
        b"II" + struct.pack("<HI", 42, ifd_off)
        + b"".join(strips) + ifd + bytes(overflow)
    )

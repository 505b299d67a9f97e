"""Vendored pure-Python baseline TIFF codec (round 9 — the document /
scan-corpus image format; completes the crawl-image family after JPEG,
PNG, GIF).

Everything derives from the public TIFF 6.0 specification and is
structural: byte-order header (II/MM + magic 42), IFD tag walk, strip
layout, PackBits RLE, and the TIFF flavor of LZW — which differs from
GIF's in exactly three documented ways, all implemented here and
exercised by tests: MSB-first bit packing, a fixed 8-bit symbol
alphabet (CLEAR=256, EOI=257, first entry 258), and the **early-change
width bump** (the code width grows one code EARLIER than the
dictionary size alone implies — TIFF writers count the not-yet-assigned
entry). Baseline tag set: gray / RGB / palette photometrics, 8-bit
samples, chunky planar config, per-strip compression none/PackBits/LZW,
and the horizontal-differencing predictor (tag 317 = 2) that pairs
with LZW.

The encoder (fixture generator) writes the same surface
deterministically, so decode(encode(img)) is bit-exact — the lossless
invertible-oracle shape of m17/m18.

100 TB shape: per-payload parallelism inside Arrow-batched mapInPandas
(LZW is serial per strip — the gif.py note applies); strips are the
format's own parallelism unit and decode independently.

Reference parity note: the reference engine has no codec surface; this
module belongs to the beyond-reference multimodal family (m19).
"""

from __future__ import annotations

import struct

import numpy as np

from tectonic_spark.operators.arena import ensure_flat_malloc

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_PACKBITS = 32773


# -------------------------------------------------------------- TIFF LZW


def _lzw_decode_tiff(data: bytes, n_out: int) -> bytes:
    """TIFF-variant LZW: MSB-first bits, 8-bit alphabet, CLEAR=256,
    EOI=257, entries from 258, EARLY width change (width grows when the
    next entry index reaches (1<<width)-1, one code earlier than GIF)."""
    CLEAR, EOI = 256, 257
    res = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    size = 258
    prev: bytes | None = None
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(res) < n_out:
        while nbits < width:
            if pos >= n:
                raise EOFError("TIFF LZW data exhausted")
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            del table[258:]
            size = 258
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code > 255:
                raise ValueError("invalid TIFF LZW code")
            prev = table[code]
            res += prev
            continue
        if code > size or (code == size and size >= 4096):
            raise ValueError("invalid TIFF LZW code")
        cur = prev + prev[:1] if code == size else table[code]
        res += cur
        if size < 4096:
            table.append(prev + cur[:1])
            size += 1
            # EARLY CHANGE: grow when the NEXT entry would not fit,
            # i.e. one code before the GIF protocol
            if size == (1 << width) - 1 and width < 12:
                width += 1
        prev = cur
    if len(res) < n_out:
        raise EOFError("TIFF LZW data exhausted")
    if len(res) > n_out:
        raise ValueError("TIFF strip overflow")
    return bytes(res)


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    buf = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict = {}
    size = 258
    emit(CLEAR)
    seq = None
    for v in data:
        if seq is None:
            seq = v
            continue
        key = (seq, v)
        nxt = table.get(key)
        if nxt is not None:
            seq = nxt
            continue
        emit(seq)
        if size < 4094:
            table[key] = size
            size += 1
            # encoder mirrors the decoder's early change with its own
            # +1 skew (decoder counts no entry on the first code)
            if size == (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR)
            table.clear()
            size = 258
            width = 9
        seq = v
    if seq is not None:
        emit(seq)
        # replay the decoder's bookkeeping for this final code: the
        # decoder adds one more table entry after consuming it, and
        # under EARLY CHANGE that add can cross the width boundary —
        # a spec-strict MSB-first reader then widens BEFORE reading
        # EOI, so EOI must be emitted at the post-growth width
        if size < 4094:
            size += 1
            if size == (1 << width) and width < 12:
                width += 1
    emit(EOI)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


# -------------------------------------------------------------- PackBits


def _packbits_decode(data: bytes, n_out: int) -> bytes:
    res = bytearray()
    pos = 0
    n = len(data)
    while len(res) < n_out:
        if pos >= n:
            raise EOFError("TIFF PackBits data exhausted")
        h = data[pos]
        pos += 1
        if h < 128:
            if pos + h + 1 > n:
                raise EOFError("TIFF PackBits data exhausted")
            res += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:
            if pos >= n:
                raise EOFError("TIFF PackBits data exhausted")
            res += bytes([data[pos]]) * (257 - h)
            pos += 1
        # h == 128: no-op per spec
    if len(res) > n_out:
        raise ValueError("TIFF strip overflow")
    return bytes(res)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 identical bytes
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch until next run of >=3
        j = i
        while (
            j + 2 < n
            and not (data[j + 1] == data[j + 2] == data[j])
            and j - i < 127
        ):
            j += 1
        j = min(j, i + 127, n - 1)
        out.append(j - i)
        out += data[i : j + 1]
        i = j + 1
    return bytes(out)


# ---------------------------------------------------------------- encoder


def encode_tiff(
    img: np.ndarray,
    compression: int = _COMP_NONE,
    predictor: int = 1,
    palette: np.ndarray | None = None,
    rows_per_strip: int = 16,
    big_endian: bool = False,
) -> bytes:
    """Deterministic baseline TIFF writer: 8-bit gray (H, W), RGB
    (H, W, 3), or palette indices with a (n<=256, 3) color map;
    compression 1/5/32773; predictor 2 (horizontal differencing) with
    LZW; multiple strips. LOSSLESS."""
    img = np.asarray(img, dtype=np.uint8)
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette images take (H, W) index input")
        photometric, spp = 3, 1
    elif img.ndim == 2:
        photometric, spp = 1, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        photometric, spp = 2, 3
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    H, W = img.shape[0], img.shape[1]
    bo = ">" if big_endian else "<"
    rows = img.reshape(H, W * spp)

    strips = []
    for r0 in range(0, H, rows_per_strip):
        block = rows[r0 : r0 + rows_per_strip]
        if predictor == 2:
            px = block.reshape(block.shape[0], -1, spp)
            block = np.concatenate(
                [px[:, :1], (px[:, 1:] - px[:, :-1])], axis=1
            ).reshape(block.shape[0], -1).astype(np.uint8)
        raw = block.tobytes()
        if compression == _COMP_NONE:
            strips.append(raw)
        elif compression == _COMP_LZW:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == _COMP_PACKBITS:
            strips.append(_packbits_encode(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == 3 and count == 1:
            # inline SHORT values are LEFT-justified in the 4-byte value
            # field (the classic big-endian TIFF gotcha)
            return (
                struct.pack(bo + "HHI", tag, typ, count)
                + struct.pack(bo + "H", value)
                + b"\x00\x00"
            )
        return struct.pack(bo + "HHII", tag, typ, count, value)

    tags = [
        (_TAG_WIDTH, 4, 1, W),
        (_TAG_HEIGHT, 4, 1, H),
        (_TAG_BITS, 3, 1, 8) if spp == 1 else None,
        (_TAG_COMPRESSION, 3, 1, compression),
        (_TAG_PHOTOMETRIC, 3, 1, photometric),
        (_TAG_SPP, 3, 1, spp),
        (_TAG_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        (_TAG_PLANAR, 3, 1, 1),
    ]
    if predictor == 2:
        tags.append((_TAG_PREDICTOR, 3, 1, 2))
    tags = [t for t in tags if t is not None]

    # layout: header(8) + IFD + out-of-line arrays + strips
    extra: list[bytes] = []

    def offset_of_extra() -> int:
        return 8 + 2 + 12 * n_entries + 4 + sum(len(e) for e in extra)

    n_entries = len(tags) + 2  # + offsets + counts
    if spp == 3:
        n_entries += 1  # BitsPerSample array
    if palette is not None:
        n_entries += 1  # ColorMap
    built: list[tuple[int, int, int, int]] = list(tags)
    if spp == 3:
        off = offset_of_extra()
        extra.append(struct.pack(bo + "HHH", 8, 8, 8))
        built.append((_TAG_BITS, 3, 3, off))
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        n = len(pal)
        cmap = np.zeros((3, 256), dtype=np.uint16)
        for c in range(3):
            cmap[c, :n] = pal[:, c].astype(np.uint16) * 257
        off = offset_of_extra()
        extra.append(cmap.astype(bo + "u2").tobytes())
        built.append((_TAG_COLORMAP, 3, 768, off))
    n_strips = len(strips)
    off = offset_of_extra()
    if n_strips == 1:
        built.append((_TAG_STRIP_COUNTS, 4, 1, len(strips[0])))
    else:
        extra.append(
            b"".join(struct.pack(bo + "I", len(s)) for s in strips)
        )
        built.append((_TAG_STRIP_COUNTS, 4, n_strips, off))
    strip_base = offset_of_extra() + (4 * n_strips if n_strips > 1 else 0)
    offs = []
    pos = strip_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if n_strips == 1:
        built.append((_TAG_STRIP_OFFSETS, 4, 1, offs[0]))
    else:
        extra.append(b"".join(struct.pack(bo + "I", o) for o in offs))
        built.append((_TAG_STRIP_OFFSETS, 4, n_strips, off + 4 * n_strips))
    built.sort(key=lambda t: t[0])  # spec: entries sorted by tag

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, 8)
    out += struct.pack(bo + "H", len(built))
    for t in built:
        out += entry(*t)
    out += struct.pack(bo + "I", 0)  # next IFD
    for e in extra:
        out += e
    for s in strips:
        out += s
    return bytes(out)


# ---------------------------------------------------------------- decoder


def _read_ifd(data: bytes, bo: str, pos: int):
    if pos + 2 > len(data):
        raise EOFError("truncated TIFF IFD")
    (n,) = struct.unpack_from(bo + "H", data, pos)
    entries = {}
    base = pos + 2
    if base + 12 * n + 4 > len(data):
        raise EOFError("truncated TIFF IFD")
    # RATIONAL (5) / SRATIONAL (10) land as (numerator, denominator)
    # tuples — EXIF (m21) rides this same walker: EXIF is a TIFF
    # structure, so GPS coordinates and exposure times need them
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 9: 4, 10: 8}
    fmts = {1: "B", 3: "H", 4: "I", 5: "II", 9: "i", 10: "ii"}
    for i in range(n):
        tag, typ, count, raw = struct.unpack_from(
            bo + "HHII", data, base + 12 * i
        )
        if typ not in sizes:
            continue  # undefined/float etc. — skip (census only)
        total = sizes[typ] * count
        if total <= 4:
            voff = base + 12 * i + 8
        else:
            voff = raw
            if voff + total > len(data):
                raise EOFError("truncated TIFF tag data")
        if typ == 2:
            entries[tag] = data[voff : voff + count]
        elif typ in (5, 10):
            flat = struct.unpack_from(bo + fmts[typ] * count, data, voff)
            entries[tag] = [
                (flat[2 * k], flat[2 * k + 1]) for k in range(count)
            ]
        else:
            entries[tag] = list(
                struct.unpack_from(bo + fmts[typ] * count, data, voff)
            )
    (nxt,) = struct.unpack_from(bo + "I", data, base + 12 * n)
    return entries, nxt


def _parse_header(data: bytes) -> tuple[str, int]:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    return bo, off


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode the first IFD to pixels: (H, W) gray, (H, W, 3) RGB or
    palette-resolved. Baseline: 8-bit samples, chunky planar, strips,
    compression none/LZW/PackBits, predictor 1/2, WhiteIsZero
    inversion."""
    ensure_flat_malloc()
    bo, off = _parse_header(data)
    tags, _ = _read_ifd(data, bo, off)

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    W = one(_TAG_WIDTH)
    H = one(_TAG_HEIGHT)
    spp = one(_TAG_SPP, 1)
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(
            "non-8-bit TIFF samples out of baseline scope"
        )
    if one(_TAG_PLANAR, 1) != 1:
        raise NotImplementedError("planar TIFF out of baseline scope")
    comp = one(_TAG_COMPRESSION, 1)
    photometric = one(_TAG_PHOTOMETRIC)
    predictor = one(_TAG_PREDICTOR, 1)
    rps = one(_TAG_ROWS_PER_STRIP, H)
    offs = tags.get(_TAG_STRIP_OFFSETS)
    cnts = tags.get(_TAG_STRIP_COUNTS)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("TIFF missing strip layout")
    rowbytes = W * spp
    out = np.empty((H, rowbytes), dtype=np.uint8)
    r = 0
    for so, sc in zip(offs, cnts):
        if so + sc > len(data):
            raise EOFError("truncated TIFF strip")
        nrows = min(rps, H - r)
        raw = data[so : so + sc]
        need = nrows * rowbytes
        if comp == _COMP_NONE:
            if len(raw) < need:
                raise EOFError("TIFF strip data exhausted")
            block = raw[:need]
        elif comp == _COMP_LZW:
            block = _lzw_decode_tiff(raw, need)
        elif comp == _COMP_PACKBITS:
            block = _packbits_decode(raw, need)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
        arr = np.frombuffer(block, dtype=np.uint8).reshape(nrows, rowbytes)
        if predictor == 2:
            arr = (
                arr.reshape(nrows, W, spp)
                .cumsum(axis=1, dtype=np.uint8)
                .reshape(nrows, rowbytes)
            )
        out[r : r + nrows] = arr
        r += nrows
    if r < H:
        raise EOFError("TIFF strips cover fewer rows than ImageLength")

    if photometric == 2:
        if spp not in (3, 4):  # 4 = RGB + one extra (alpha) sample
            raise ValueError("RGB TIFF without 3 or 4 samples per pixel")
        return out.reshape(H, W, spp)
    px = out.reshape(H, W)
    if photometric == 0:  # WhiteIsZero
        return (255 - px).astype(np.uint8)
    if photometric == 1:
        return px
    if photometric == 3:
        cmap = tags.get(_TAG_COLORMAP)
        if not cmap or len(cmap) != 768:
            raise ValueError("palette TIFF without a 768-entry ColorMap")
        cm = np.asarray(cmap, dtype=np.uint16).reshape(3, 256)
        return (cm.T[px] // 257).astype(np.uint8)
    raise NotImplementedError(f"TIFF photometric {photometric}")


def parse_tiff(data: bytes) -> dict:
    """Structural census: byte order, page count, first-page geometry
    and codec tags (m01 metadata surface)."""
    bo, off = _parse_header(data)
    pages = 0
    first = None
    seen = set()
    while off:
        if off in seen:
            raise ValueError("TIFF IFD loop")
        seen.add(off)
        tags, off = _read_ifd(data, bo, off)
        if first is None:
            first = tags
        pages += 1
    if first is None:
        raise ValueError("TIFF with no IFD")

    def one(tag, default=0):
        v = first.get(tag)
        return v[0] if v else default

    return {
        "byte_order": "MM" if bo == ">" else "II",
        "n_pages": pages,
        "width": one(_TAG_WIDTH),
        "height": one(_TAG_HEIGHT),
        "compression": one(_TAG_COMPRESSION, 1),
        "photometric": one(_TAG_PHOTOMETRIC),
        "predictor": one(_TAG_PREDICTOR, 1),
        "n_strips": len(first.get(_TAG_STRIP_OFFSETS, [])),
    }

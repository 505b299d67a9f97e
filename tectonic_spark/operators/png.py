"""Vendored pure-Python+numpy PNG codec (VERDICT r8 item 3 — the last
big-ticket image format of real crawls after baseline+progressive JPEG).

Why PNG is safely buildable here: the entire format is structural —
chunk framing with CRC-32, zlib/DEFLATE compression (stdlib ``zlib``,
no vendoring risk), and five closed-form byte filters — with ZERO
constant tables, so every line derives from the public W3C PNG spec
(RFC 2083). The format is LOSSLESS: decode(encode(img)) must equal img
bit-for-bit for every filter choice, giving the same exactly-invertible
oracle shape as the m08 JPEG fixtures.

Decoder coverage: chunk walk with per-chunk CRC validation, IHDR
sanity, PLTE palette lookup, multi-IDAT streams, color types
0/2/3/4/6, bit depths 1/2/4/8/16 (sub-byte via vectorized bit
unpacking), all five filters, Adam7 interlacing (bit depths >= 8),
truncation/garbage error taxonomy.

Unfiltering is the only sequentially-constrained stage (filters 1/3/4
read the RECONSTRUCTED left pixel), and it is vectorized in two tiers:

* **row tier** — images whose rows use only filters None/Sub/Up
  reconstruct row-sequentially with one-two numpy ops per row (Sub is
  a per-byte-lane ``np.add.accumulate`` mod 256);
* **wavefront tier** — when any row uses Average/Paeth, the whole
  image runs as an anti-diagonal wavefront: every filter reads only
  (left, up, up-left), so all cells of diagonal ``r+i = d`` depend
  only on diagonals ``d-1``/``d-2`` and reconstruct in ONE vectorized
  step across the diagonal (masked per-row filter codes, zero-padded
  borders so no boundary branches). ~H+W steps of width
  min(H, W) x bytes-per-pixel instead of H*W scalar steps.

Encoder (fixture generator): color types 0/2/3/4/6, depths 8/16 (and
1/2/4 for gray/palette), per-row filter control (default cycles
0..4 so one fixture exercises every filter), optional Adam7 —
filtering on the encode side has no recurrence (predictors read
ORIGINAL bytes), so it is fully vectorized.

100 TB shape: decode is embarrassingly parallel per payload inside
Arrow-batched mapInPandas (the m08 pattern); compressed bytes never
shuffle; per-image scratch is O(3 x raw pixel bytes).

Reference parity note: the reference engine has no codec surface; this
module belongs to the beyond-reference multimodal family (m17).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from tectonic_spark.operators.arena import ensure_flat_malloc

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass grid: (x0, y0, dx, dy) per spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


# ---------------------------------------------------------------- encoder


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec §9.4) over uint8 arrays."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa = np.abs(p - a16)
    pb = np.abs(p - b16)
    pc = np.abs(p - c16)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def _filter_rows(rows: np.ndarray, bpp: int, filters) -> bytes:
    """Filter a (H, row_bytes) uint8 block. Encode-side predictors read
    ORIGINAL bytes, so every filter is one vectorized pass per row."""
    H, Wb = rows.shape
    if isinstance(filters, int):
        fts = [filters] * H
    elif filters is None:
        fts = [r % 5 for r in range(H)]
    else:
        fts = list(filters)
        if len(fts) != H:
            raise ValueError("filters list must have one entry per row")
    out = np.empty((H, Wb + 1), dtype=np.uint8)
    zero = np.zeros(Wb, dtype=np.uint8)
    for r in range(H):
        f = fts[r]
        cur = rows[r]
        prev = rows[r - 1] if r else zero
        left = np.concatenate([zero[:bpp], cur[:-bpp]])
        ul = np.concatenate([zero[:bpp], prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (
                (left.astype(np.uint16) + prev) >> 1
            ).astype(np.uint8)
        elif f == 4:
            enc = cur - _paeth_pred(left, prev, ul)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[r, 0] = f
        out[r, 1:] = enc
    return out.tobytes()


def _pack_rows(img: np.ndarray, bit_depth: int) -> np.ndarray:
    """(H, W[, C]) samples -> (H, row_bytes) uint8 scanlines."""
    H = img.shape[0]
    if bit_depth == 16:
        return np.ascontiguousarray(
            img.astype(">u2").view(np.uint8).reshape(H, -1)
        )
    if bit_depth == 8:
        return np.ascontiguousarray(img.astype(np.uint8).reshape(H, -1))
    # sub-byte gray/palette: big-endian bit packing within each byte
    W = img.shape[1]
    vals = img.astype(np.uint8).reshape(H, W)
    if (vals >= (1 << bit_depth)).any():
        raise ValueError("sample exceeds bit depth")
    bits = (
        (vals[:, :, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
    ).reshape(H, W * bit_depth)
    return np.packbits(bits, axis=1)


def encode_png(
    img: np.ndarray,
    bit_depth: int | None = None,
    palette: np.ndarray | None = None,
    filters=None,
    interlace: bool = False,
    level: int = 6,
) -> bytes:
    """Deterministic PNG writer. ``img``: (H, W) gray / palette indices,
    (H, W, 2) gray+alpha, (H, W, 3) RGB, (H, W, 4) RGBA; uint16 input
    (or bit_depth=16) writes 16-bit samples. ``filters``: int, per-row
    list, or None to cycle 0..4 (full filter coverage per fixture).
    LOSSLESS: decode_png(encode_png(img)) == img exactly."""
    img = np.asarray(img)
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette images take (H, W) index input")
        ct = 3
    elif img.ndim == 2:
        ct = 0
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        ct = {2: 4, 3: 2, 4: 6}[img.shape[2]]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if bit_depth is None:
        bit_depth = 16 if img.dtype == np.uint16 else 8
    if bit_depth not in _DEPTHS[ct]:
        raise ValueError(f"bit depth {bit_depth} invalid for color type {ct}")
    H, W = img.shape[0], img.shape[1]
    bpp = max(1, _CHANNELS[ct] * bit_depth // 8)

    ihdr = struct.pack(">IIBBBBB", W, H, bit_depth, ct, 0, 0, int(interlace))
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if ct == 3:
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
            raise ValueError("palette must be (n<=256, 3) uint8")
        if int(img.max(initial=0)) >= len(pal):
            raise ValueError("frame index exceeds palette")
        out.append(_chunk(b"PLTE", pal.tobytes()))

    if not interlace:
        raw = _filter_rows(_pack_rows(img, bit_depth), bpp, filters)
    else:
        if bit_depth < 8:
            raise NotImplementedError(
                "sub-byte Adam7 encode out of scope (rare corner; "
                "non-interlaced covers depths 1/2/4)"
            )
        parts = []
        fi = 0
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            if isinstance(filters, (list, tuple)):
                fsub = filters[fi : fi + sub.shape[0]]
                fi += sub.shape[0]
            else:
                fsub = filters
            parts.append(_filter_rows(_pack_rows(sub, bit_depth), bpp, fsub))
        raw = b"".join(parts)

    out.append(_chunk(b"IDAT", zlib.compress(raw, level)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


# ---------------------------------------------------------------- decoder


def _walk_chunks(data: bytes):
    """Yield (type, payload) with CRC validation; raises the error
    taxonomy for truncation / bad signature / CRC mismatch."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    n = len(data)
    while pos < n:
        if pos + 8 > n:
            raise EOFError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise EOFError(f"truncated PNG chunk {typ!r}")
        payload = data[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", data, end)
        if crc != zlib.crc32(typ + payload):
            raise ValueError(f"PNG chunk CRC mismatch ({typ.decode('latin1')})")
        yield typ, payload
        pos = end + 4
        if typ == b"IEND":
            return
    raise EOFError("missing IEND chunk")


def _parse_ihdr(payload: bytes) -> tuple[int, int, int, int, int]:
    if len(payload) != 13:
        raise ValueError("bad IHDR length")
    w, h, depth, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
    if w == 0 or h == 0:
        raise ValueError("zero PNG dimension")
    if ct not in _CHANNELS or depth not in _DEPTHS[ct]:
        raise ValueError(f"invalid color type / bit depth ({ct}/{depth})")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace > 1:
        raise ValueError("unknown PNG interlace method")
    return w, h, depth, ct, interlace


def _unfilter_rows(ft: np.ndarray, d: np.ndarray, bpp: int) -> np.ndarray:
    """Row tier: filters 0/1/2 only — one-two vectorized ops per row.
    Sub (1) is a cumulative sum mod 256 along bpp-strided byte lanes."""
    H, Wb = d.shape
    out = np.empty((H, Wb), dtype=np.uint8)
    prev = np.zeros(Wb, dtype=np.uint8)
    for r in range(H):
        f = ft[r]
        if f == 0:
            out[r] = d[r]
        elif f == 1:
            np.add.accumulate(
                d[r].reshape(-1, bpp),
                axis=0,
                dtype=np.uint8,
                out=out[r].reshape(-1, bpp),
            )
        else:
            np.add(d[r], prev, out=out[r])
        prev = out[r]
    return out


def _unfilter_wavefront(ft: np.ndarray, d: np.ndarray, bpp: int) -> np.ndarray:
    """Wavefront tier: any mix of the five filters. All cells of
    anti-diagonal ``row + pixel = dg`` reconstruct together because
    every filter reads only (left, up, up-left) — strictly earlier
    diagonals, so each diagonal is ONE vectorized step. O is
    zero-padded one row up / one pixel left so the border cases need no
    branches (spec: out-of-image predictors read zero). A diagonal's
    cells form an arithmetic progression in flat (row-major) index
    space — cell (r, dg-r) sits at r*npix + dg + npix + 2 in the padded
    grid — so the gathers are flat ``take`` calls over precomputed
    index bases, not 2-D fancy indexing."""
    H, Wb = d.shape
    npix = Wb // bpp
    Dflat = d.reshape(H * npix, bpp)
    O = np.zeros(((H + 1) * (npix + 1), bpp), dtype=np.uint8)
    # padded flat id of cell (r, i) is (r+1)*(npix+1) + (i+1); with
    # i = dg - r this is r*npix + (dg + npix + 2)
    ridx = np.arange(H, dtype=np.int64) * npix + npix + 2
    didx = np.arange(H, dtype=np.int64) * (npix - 1)
    fcol = ft.astype(np.uint8)[:, None]
    up_off = npix + 1
    for dg in range(H + npix - 1):
        r0 = max(0, dg - npix + 1)
        r1 = min(H - 1, dg) + 1
        cells = ridx[r0:r1] + dg
        left = O.take(cells - 1, axis=0)
        up = O.take(cells - up_off, axis=0)
        ul = O.take(cells - up_off - 1, axis=0)
        f = fcol[r0:r1]
        # Paeth via the standard reformulation pa=|b-c| pb=|a-c|
        # pc=|(b-c)+(a-c)| — two fewer passes than computing p first
        t1 = up.astype(np.int16) - ul
        t2 = left.astype(np.int16) - ul
        pa = np.abs(t1)
        pb = np.abs(t2)
        pc = np.abs(t1 + t2)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        ).astype(np.uint8)
        avg = ((left.astype(np.uint16) + up) >> 1).astype(np.uint8)
        pred = np.choose(f, (0, left, up, avg, paeth))
        O[cells] = Dflat.take(didx[r0:r1] + dg, axis=0) + pred
    out = O.reshape(H + 1, npix + 1, bpp)[1:, 1:]
    return np.ascontiguousarray(out).reshape(H, Wb)


def _unfilter(raw: np.ndarray, bpp: int) -> np.ndarray:
    ft = raw[:, 0]
    bad = ft > 4
    if bad.any():
        raise ValueError(f"invalid PNG filter type {int(ft[bad][0])}")
    d = raw[:, 1:]
    if ((ft == 3) | (ft == 4)).any():
        return _unfilter_wavefront(ft, d, bpp)
    return _unfilter_rows(ft, d, bpp)


def _unpack_samples(
    rows: np.ndarray, width: int, depth: int, channels: int
) -> np.ndarray:
    """(H, row_bytes) reconstructed scanlines -> (H, W, C) samples
    (uint8, or uint16 for depth 16)."""
    H = rows.shape[0]
    if depth == 16:
        return (
            rows.reshape(H, -1)
            .view(">u2")
            .astype(np.uint16)
            .reshape(H, width, channels)
        )
    if depth == 8:
        return rows.reshape(H, width, channels)
    bits = np.unpackbits(rows, axis=1)[:, : width * depth]
    if depth == 1:
        return bits.reshape(H, width, 1)
    g = bits.reshape(H, width, depth)
    w = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (g * w).sum(axis=2, dtype=np.uint8).reshape(H, width, 1)


def _parse_payload(data: bytes):
    """Chunk walk + inflate: everything up to unfiltering. Returns
    (W, H, depth, ct, interlace, palette, raw_bytes)."""
    ihdr = None
    palette = None
    idat_parts: list[bytes] = []
    idat_done = False
    for typ, payload in _walk_chunks(data):
        if ihdr is None:
            if typ != b"IHDR":
                raise ValueError("first chunk is not IHDR")
            ihdr = _parse_ihdr(payload)
            continue
        if typ == b"IHDR":
            raise ValueError("duplicate IHDR")
        if typ == b"PLTE":
            if len(payload) % 3 or len(payload) > 768 or idat_parts:
                raise ValueError("bad PLTE placement or length")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            if idat_done:
                raise ValueError("non-consecutive IDAT chunks")
            idat_parts.append(payload)
        elif typ == b"IEND":
            break
        else:
            if idat_parts:
                idat_done = True
            # ancillary chunks (tEXt, gAMA, ...) are skipped; CRC was
            # still validated by the walk
    if ihdr is None:
        raise ValueError("first chunk is not IHDR")
    W, H, depth, ct, interlace = ihdr
    if ct == 3 and palette is None:
        raise ValueError("palette image without PLTE")
    if not idat_parts:
        raise ValueError("no IDAT data")

    dec = zlib.decompressobj()
    try:
        raw = dec.decompress(b"".join(idat_parts))
        raw += dec.flush()
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate error: {exc}") from exc
    return W, H, depth, ct, interlace, palette, raw


def _finish_pixels(px: np.ndarray, H: int, W: int, channels: int, palette):
    if palette is not None:
        if int(px.max()) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[px.reshape(H, W)]
    if channels == 1:
        return px.reshape(H, W)
    return px


def decode_png(data: bytes, _stats: dict | None = None) -> np.ndarray:
    """Decode a PNG payload to pixel samples: (H, W) for grayscale,
    (H, W, 3) for RGB and palette, (H, W, 2)/(H, W, 4) with alpha;
    uint16 for 16-bit depth, raw index-range samples for sub-byte gray.
    ``_stats`` (optional dict) receives decoder telemetry — per-filter
    row counts and which unfilter tier ran — so callers can PIN the
    wavefront route in oracle-checked outputs (the m14 rode_engine
    pattern)."""
    W, H, depth, ct, interlace, palette, raw = _parse_payload(data)
    channels = _CHANNELS[ct]
    bpp = max(1, channels * depth // 8)

    if _stats is not None:
        _stats.setdefault("filter_rows", [0, 0, 0, 0, 0])
        _stats.setdefault("wavefront", False)

    def run(block: np.ndarray, width: int) -> np.ndarray:
        if _stats is not None:
            ft = block[:, 0]
            for k in range(5):
                _stats["filter_rows"][k] += int((ft == k).sum())
            if ((ft == 3) | (ft == 4)).any():
                _stats["wavefront"] = True
        return _unpack_samples(
            _unfilter(block, bpp), width, depth, channels
        )

    if interlace == 0:
        rb = (W * channels * depth + 7) // 8
        need = H * (1 + rb)
        if len(raw) < need:
            raise EOFError("PNG pixel data exhausted")
        if len(raw) > need:
            raise ValueError("trailing garbage after PNG pixel data")
        px = run(np.frombuffer(raw, dtype=np.uint8).reshape(H, 1 + rb), W)
    else:
        if depth < 8:
            raise NotImplementedError(
                "sub-byte Adam7 decode out of scope (rare corner; "
                "depths 8/16 interlaced and all non-interlaced depths "
                "are covered)"
            )
        px = np.zeros(
            (H, W, channels), dtype=np.uint16 if depth == 16 else np.uint8
        )
        buf = np.frombuffer(raw, dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (W - x0 + dx - 1) // dx
            ph = (H - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rb = pw * bpp
            need = ph * (1 + rb)
            if pos + need > buf.size:
                raise EOFError("PNG pixel data exhausted")
            block = buf[pos : pos + need].reshape(ph, 1 + rb)
            pos += need
            px[y0::dy, x0::dx] = run(block, pw)
        if pos != buf.size:
            raise ValueError("trailing garbage after PNG pixel data")

    return _finish_pixels(px, H, W, channels, palette if ct == 3 else None)


# -------------------------------------------------------- batch lane pool
#
# Cross-image wavefront pooling (r9). The per-image wavefront is already
# vectorized along each anti-diagonal, but a W-pixel image still costs
# ~H+W numpy dispatches; a corpus batch amortizes them by running MANY
# wavefronts in lockstep. The lane unit is an independent-row SEGMENT:
# a row whose filter is None or Sub reads nothing above it, so an image
# partitions at every such row into segments whose unfilter recurrences
# are mutually independent — one all-Paeth photo is a single tall lane,
# while a filter-cycling fixture yields ~H/5 four-row lanes from ONE
# payload (which is what makes pool routing deterministically pinnable
# per payload, the m15 pattern). Segments without Average/Paeth rows
# skip the pool entirely and reconstruct on the fast row tier.
#
# Every lane gets a zero-padded (h+1) x (npix+1) region in one shared
# flat buffer; cells are scheduled by counting-sort on their diagonal
# number, so step dg reconstructs diagonal dg of EVERY lane with one
# vectorized pass (per-cell filter codes and per-lane up-offsets ride
# precomputed int32 schedules). Scratch is arena-backed (operators/
# arena.py — the r8 fresh-page lesson) and capped per sub-pool.

# Pool gate, measured on local[32] (r9, all-Paeth 256x256 RGB photos,
# one tall lane each): solo the pool loses ~12% to schedule-build
# overhead (5.5 scalar vs 4.8 MB/s), from TWO lanes it wins (7.8 vs
# 5.0), peaking ~15 MB/s at 16 lanes (2-3x scalar). Counted in LANES so
# one filter-cycling payload (m17: ~102 four-row segments) rides the
# pool deterministically regardless of batch composition.
MIN_PNG_POOL_LANES = 2
PNG_POOL_BYTE_CAP = 64 * 1024 * 1024


def _arena():
    from tectonic_spark.operators.arena import get_arena

    return get_arena("png_pool")


def _segments(ft: np.ndarray) -> list[tuple[int, int, bool]]:
    """Split rows into independent segments: a new segment starts at
    row 0 and at every None/Sub row (they read nothing above).
    Returns (r0, r1, needs_wavefront) triples."""
    H = ft.shape[0]
    starts = np.flatnonzero(ft <= 1)
    if starts.size == 0 or starts[0] != 0:
        starts = np.concatenate([[0], starts])
    bounds = np.concatenate([starts, [H]])
    wf = (ft == 3) | (ft == 4)
    cum = np.concatenate([[0], np.cumsum(wf)])
    out = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        out.append((int(a), int(b), bool(cum[b] - cum[a])))
    return out


def _run_wave_pool(lanes: list) -> None:
    """lanes: (ft_slice, D (h, npix, bpp) uint8, sink (out_rows, r0)).
    Reconstructs every lane's segment in diagonal lockstep and writes
    the rows into its sink. All lanes share one bpp."""
    arena = _arena()
    arena.reset()
    bpp = lanes[0][1].shape[2]
    bases = []
    total_pad = 0
    ndiag = 0
    ncells = 0
    for ft, D, _ in lanes:
        h, npix = D.shape[0], D.shape[1]
        bases.append(total_pad)
        total_pad += (h + 1) * (npix + 1)
        ndiag = max(ndiag, h + npix - 1)
        ncells += h * npix
    O2 = arena.zeros(total_pad * bpp, np.uint8).reshape(total_pad, bpp)
    D2 = arena.take(total_pad * bpp, np.uint8).reshape(total_pad, bpp)
    DG = arena.take(ncells, np.int32)
    ID = arena.take(ncells, np.int32)
    UP = arena.take(ncells, np.int32)
    FC = arena.take(ncells, np.uint8)
    pos = 0
    for (ft, D, _), base in zip(lanes, bases):
        h, npix = D.shape[0], D.shape[1]
        n = h * npix
        r = np.arange(h, dtype=np.int32)[:, None]
        i = np.arange(npix, dtype=np.int32)[None, :]
        ids = base + (r + 1) * (npix + 1) + (i + 1)
        ID[pos : pos + n] = ids.ravel()
        DG[pos : pos + n] = (r + i).ravel()
        UP[pos : pos + n] = npix + 1
        FC[pos : pos + n] = np.repeat(ft, npix)
        D2[ids.reshape(-1)] = D.reshape(n, bpp)
        pos += n
    order = np.argsort(DG, kind="stable")
    SCHED = arena.take(ncells, np.int32)
    np.take(ID, order, out=SCHED)
    UPo = arena.take(ncells, np.int32)
    np.take(UP, order, out=UPo)
    FCo = arena.take(ncells, np.uint8)
    np.take(FC, order, out=FCo)
    off = np.concatenate([[0], np.cumsum(np.bincount(DG, minlength=ndiag))])
    for dg in range(ndiag):
        s, e = off[dg], off[dg + 1]
        cells = SCHED[s:e]
        upo = UPo[s:e]
        f = FCo[s:e][:, None]
        left = O2.take(cells - 1, axis=0)
        up = O2.take(cells - upo, axis=0)
        ul = O2.take(cells - upo - 1, axis=0)
        t1 = up.astype(np.int16) - ul
        t2 = left.astype(np.int16) - ul
        pa = np.abs(t1)
        pb = np.abs(t2)
        pc = np.abs(t1 + t2)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        ).astype(np.uint8)
        avg = ((left.astype(np.uint16) + up) >> 1).astype(np.uint8)
        pred = np.choose(f, (0, left, up, avg, paeth))
        O2[cells] = D2.take(cells, axis=0) + pred
    for (ft, D, sink), base in zip(lanes, bases):
        h, npix = D.shape[0], D.shape[1]
        blk = O2[base : base + (h + 1) * (npix + 1)].reshape(
            h + 1, npix + 1, bpp
        )[1:, 1:]
        out_rows, r0 = sink
        out_rows[r0 : r0 + h] = blk.reshape(h, npix * bpp)


def payload_rides_png_pool(data: bytes) -> bool:
    """True iff this payload is pool-eligible (non-interlaced, valid
    filters) and contributes >= MIN_PNG_POOL_LANES wavefront segment
    lanes ON ITS OWN, so pool routing is deterministic regardless of
    batch composition (a batch only ever ADDS lanes — the m15 pin
    pattern). Runs the chunk walk + inflate but no unfiltering."""
    try:
        W, H, depth, ct, interlace, palette, raw = _parse_payload(data)
    except (ValueError, EOFError, NotImplementedError):
        return False
    if interlace:
        return False
    channels = _CHANNELS[ct]
    rb = (W * channels * depth + 7) // 8
    if len(raw) != H * (1 + rb):
        return False
    ft = np.frombuffer(raw, dtype=np.uint8).reshape(H, 1 + rb)[:, 0]
    if (ft > 4).any():
        return False
    return sum(1 for *_r, wf in _segments(ft) if wf) >= MIN_PNG_POOL_LANES


def decode_png_batch(
    payloads: list[bytes], stats_out: list | None = None
) -> list[np.ndarray]:
    """Decode a batch of PNG payloads, pooling the Average/Paeth
    segments of non-interlaced images into cross-image wavefront lanes
    (None/Sub/Up segments reconstruct on the row tier; interlaced and
    below-gate batches fall back per-image). Pixel output is
    bit-identical to ``[decode_png(p) for p in payloads]``; on
    malformed batches the exception types match the scalar loop's but
    the raise point/ordering may differ (the jpeg batch contract).
    ``stats_out``, if a list, receives one per-image stats dict
    (filter_rows / wavefront / pooled). Sub-pools are capped at
    PNG_POOL_BYTE_CAP of padded scratch per bpp bucket."""
    ensure_flat_malloc()
    n = len(payloads)
    out: list = [None] * n
    stats: list[dict] = [
        {"filter_rows": [0, 0, 0, 0, 0], "wavefront": False, "pooled": False}
        for _ in range(n)
    ]
    plan = []  # (idx, H, W, depth, ct, channels, bpp, palette, block, ft, segs)
    lane_count = 0
    for idx, data in enumerate(payloads):
        W, H, depth, ct, interlace, palette, raw = _parse_payload(data)
        channels = _CHANNELS[ct]
        bpp = max(1, channels * depth // 8)
        if interlace:
            out[idx] = decode_png(data, _stats=stats[idx])
            continue
        rb = (W * channels * depth + 7) // 8
        need = H * (1 + rb)
        if len(raw) < need:
            raise EOFError("PNG pixel data exhausted")
        if len(raw) > need:
            raise ValueError("trailing garbage after PNG pixel data")
        block = np.frombuffer(raw, dtype=np.uint8).reshape(H, 1 + rb)
        ft = block[:, 0]
        bad = ft > 4
        if bad.any():
            raise ValueError(f"invalid PNG filter type {int(ft[bad][0])}")
        for k in range(5):
            stats[idx]["filter_rows"][k] = int((ft == k).sum())
        segs = _segments(ft)
        wf_segs = sum(1 for *_r, wf in segs if wf)
        stats[idx]["wavefront"] = bool(wf_segs)
        lane_count += wf_segs
        plan.append(
            (idx, H, W, depth, ct, channels, bpp, palette, block, ft, segs)
        )

    pool_on = lane_count >= MIN_PNG_POOL_LANES
    pools: dict[int, list] = {}
    pool_bytes: dict[int, int] = {}
    finish = []  # (idx, H, W, depth, channels, ct, palette, rows)

    def flush(bpp: int) -> None:
        lanes = pools.get(bpp)
        if lanes:
            _run_wave_pool(lanes)
        pools[bpp] = []
        pool_bytes[bpp] = 0

    for idx, H, W, depth, ct, channels, bpp, palette, block, ft, segs in plan:
        d = block[:, 1:]
        npix = d.shape[1] // bpp
        if not pool_on:
            rows = _unfilter(block, bpp)
            finish.append((idx, H, W, depth, channels, ct, palette, rows))
            continue
        stats[idx]["pooled"] = stats[idx]["wavefront"]
        rows = np.empty((H, d.shape[1]), dtype=np.uint8)
        for r0, r1, wf in segs:
            if not wf:
                rows[r0:r1] = _unfilter_rows(ft[r0:r1], d[r0:r1], bpp)
            else:
                sz = (r1 - r0 + 1) * (npix + 1) * bpp
                if pool_bytes.get(bpp, 0) and pool_bytes[bpp] + sz > PNG_POOL_BYTE_CAP:
                    flush(bpp)
                pools.setdefault(bpp, []).append(
                    (
                        ft[r0:r1],
                        d[r0:r1].reshape(r1 - r0, npix, bpp),
                        (rows, r0),
                    )
                )
                pool_bytes[bpp] = pool_bytes.get(bpp, 0) + sz
        finish.append((idx, H, W, depth, channels, ct, palette, rows))
    for bpp in list(pools):
        flush(bpp)

    for idx, H, W, depth, channels, ct, palette, rows in finish:
        px = _unpack_samples(rows, W, depth, channels)
        out[idx] = _finish_pixels(
            px, H, W, channels, palette if ct == 3 else None
        )
    if stats_out is not None:
        stats_out.extend(stats)
    return out


def parse_png(data: bytes) -> dict:
    """Structural walk without inflating pixel data: IHDR fields +
    chunk census (m01 metadata surface)."""
    ihdr = None
    n_chunks = 0
    idat_bytes = 0
    pal_entries = 0
    for typ, payload in _walk_chunks(data):
        n_chunks += 1
        if n_chunks == 1 and typ != b"IHDR":
            raise ValueError("first chunk is not IHDR")
        if typ == b"IHDR":
            ihdr = _parse_ihdr(payload)
        elif typ == b"IDAT":
            idat_bytes += len(payload)
        elif typ == b"PLTE":
            pal_entries = len(payload) // 3
    W, H, depth, ct, interlace = ihdr
    return {
        "width": W,
        "height": H,
        "bit_depth": depth,
        "color_type": ct,
        "interlace": interlace,
        "n_chunks": n_chunks,
        "idat_bytes": idat_bytes,
        "palette_entries": pal_entries,
    }

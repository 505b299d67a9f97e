"""Vendored pure-Python WebP codec (round 10, m20 — VERDICT r9 item 2:
after JPEG/PNG/GIF/TIFF, WebP is the remaining high-volume web image
format; it outranks GIF in modern crawls).

Scope split, mirroring the family's documented boundaries:

* **VP8L (lossless) decode + encode — FULL.** The lossless flavor is
  entirely structural — everything below derives from the public WebP
  lossless bitstream specification (RFC 9649): LSB-first bit packing,
  canonical prefix codes (DEFLATE-style code assignment, the 19-symbol
  code-length code with 16/17/18 repeats and the optional max_symbol
  field, plus the 1-or-2-symbol "simple" code form), color-cache
  (hash ``0x1e35a7bd * argb >> (32 - bits)``), LZ77 backward
  references with the 120-entry close-neighborhood distance mapping,
  meta prefix groups via a sub-resolution prefix-code image, and the
  four transforms — predictor (14 modes), color (per-tile signed
  ``(t * c) >> 5`` deltas), subtract-green, and color-indexing with
  sub-byte pixel bundling. There are ZERO constant tables: the
  distance map is generated from its defining rule (offsets
  ``(x, y), y in 0..7, x in -7..8``, pixels preceding the current one,
  ordered by ``x*x + y*y`` with larger-y-then-larger-x tie-breaks),
  and the code-length reading order is part of the format grammar.
* **VP8 (lossy)**: structural census only — keyframe sync code +
  dimensions surface in :func:`parse_webp`; pixel decode is a full
  DCT/bool-coder build documented out like H.264 pixel decode.
* **ALPH chunk**: lossless-compressed alpha planes decode natively
  (the payload is a headerless VP8L image stream whose green channel
  carries alpha, plus the 4 post-filters). This is the module's
  third-party interop pin: CPython ships a real libwebp-encoded
  ``python.webp`` (VP8X + lossless ALPH + lossy VP8) in its test data.
* **VP8X**: extended-container walk — canvas size, feature flags,
  ANMF frame census, EXIF/XMP/ICCP presence (the EXIF payload feeds
  m21's TIFF IFD walker: EXIF is a TIFF structure).

Lossless means decode(encode(img)) is bit-exact, so m20 rides the same
closed-form invertible pixel-sum oracle as m17/m18/m19.

100 TB shape: per-payload parallelism inside Arrow-batched mapInPandas
(the m08 pattern); payloads never shuffle. The entropy loop is serial
per image (LZ77 + adaptive cache state), like GIF's LZW — the scale
lever is per-payload parallelism; the transform inverses vectorize.

Reference parity note: the reference engine has no codec surface; this
module belongs to the beyond-reference multimodal family (m20).
"""

from __future__ import annotations

import struct

import numpy as np

from tectonic_spark.operators.arena import ensure_flat_malloc

# transform types, in spec numbering
_T_PREDICTOR = 0
_T_COLOR = 1
_T_SUBTRACT_GREEN = 2
_T_COLOR_INDEXING = 3

# code-length-code reading order (format grammar)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_HASH_MUL = 0x1E35A7BD


def _dist_map() -> list[tuple[int, int]]:
    """The 120 close-neighborhood offsets for distance codes 1..120,
    generated from their defining rule: all pixels (x, y) with
    y in 0..7, x in -7..8 that precede the current pixel in scan order
    (y > 0, or y == 0 and x > 0), ordered by squared Euclidean distance
    with ties broken by larger y first, then larger x first."""
    offs = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    offs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    assert len(offs) == 120
    return offs


_DIST_TABLE = _dist_map()
_DIST_CODE_OF = {off: i + 1 for i, off in enumerate(_DIST_TABLE)}


# ------------------------------------------------------------------ bit I/O


class _BitReader:
    """LSB-first bit reader over bytes (DEFLATE convention)."""

    __slots__ = ("data", "pos", "buf", "nbits", "n")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.n = len(data)

    def read(self, k: int) -> int:
        while self.nbits < k:
            if self.pos >= self.n:
                raise EOFError("WebP bitstream exhausted")
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.buf & ((1 << k) - 1)
        self.buf >>= k
        self.nbits -= k
        return v

    def read_bit(self) -> int:
        if not self.nbits:
            if self.pos >= self.n:
                raise EOFError("WebP bitstream exhausted")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        v = self.buf & 1
        self.buf >>= 1
        self.nbits -= 1
        return v

    def peek(self, k: int) -> int:
        """Next k bits without consuming; zero-pads past EOF (the
        standard inflate convention — an overrun only errors if a
        consume actually crosses it)."""
        while self.nbits < k:
            if self.pos >= self.n:
                return self.buf & ((1 << k) - 1)
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        return self.buf & ((1 << k) - 1)

    def consume(self, k: int) -> None:
        if k > self.nbits:
            raise EOFError("WebP bitstream exhausted")
        self.buf >>= k
        self.nbits -= k


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, k: int) -> None:
        self.buf |= (value & ((1 << k) - 1)) << self.nbits
        self.nbits += k
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        # prefix codes pack MSB-of-code first into the LSB-first stream
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


# ----------------------------------------------------------- prefix codes


class _PrefixCode:
    """Canonical prefix decoder: DEFLATE-style code assignment
    (codes of each length are consecutive, ordered by symbol), bits
    read MSB-of-code first. A 0-length table entry set of exactly one
    symbol decodes to it consuming zero bits (the simple-code form and
    degenerate single-symbol codes)."""

    __slots__ = ("single", "codes", "max_len", "lut_sym", "lut_len")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("WebP prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.codes = None
            return
        self.single = None
        # completeness check (Kraft equality) — over/under-subscribed
        # codes are corrupt streams
        max_len = max(ln for ln, _ in nz)
        kraft = sum(1 << (max_len - ln) for ln, _ in nz)
        if kraft != (1 << max_len):
            raise ValueError("invalid WebP prefix code (not complete)")
        bl_count = [0] * (max_len + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        codes = []  # (sym, code, len) in canonical order
        for sym in range(len(lengths)):
            ln = lengths[sym]
            if ln > 0:
                codes.append((sym, next_code[ln], ln))
                next_code[ln] += 1
        self.codes = codes
        self.max_len = max_len
        self.lut_sym = None
        self.lut_len = None

    def _build_lut(self) -> None:
        """zlib-style flat decode table, indexed by the next max_len
        STREAM bits (LSB-first): each canonical code occupies the
        bit-reversed slot pattern. Built lazily (numpy fill, total
        writes == 2^max_len by Kraft equality) on the first decode."""
        L = self.max_len
        sym_t = np.empty(1 << L, dtype=np.int32)
        len_t = np.empty(1 << L, dtype=np.uint8)
        for sym, code, ln in self.codes:
            rev = int(f"{code:0{ln}b}"[::-1], 2)
            idx = rev + (np.arange(1 << (L - ln), dtype=np.int64) << ln)
            sym_t[idx] = sym
            len_t[idx] = ln
        self.lut_sym = sym_t.tolist()
        self.lut_len = len_t.tolist()

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.lut_sym is None:
            self._build_lut()
        idx = br.peek(self.max_len)
        br.consume(self.lut_len[idx])
        return self.lut_sym[idx]

    def tables(self) -> tuple[list[int], list[int], int]:
        """(lut_sym, lut_len, max_len) for inlined decoding; single-
        symbol codes present as a 1-entry zero-length table."""
        if self.single is not None:
            return [self.single], [0], 0
        if self.lut_sym is None:
            self._build_lut()
        return self.lut_sym, self.lut_len, self.max_len


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code form: 1 or 2 symbols, explicit
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol on 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        lengths = [0] * alphabet_size
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("WebP simple code symbol out of range")
        if num_symbols == 1:
            lengths[syms[0]] = 1  # single → zero-bit decode via `single`
        else:
            lengths[syms[0]] = 1
            if syms[1] == syms[0]:
                raise ValueError("WebP simple code repeats a symbol")
            lengths[syms[1]] = 1
        return _PrefixCode(lengths)

    # normal form: code lengths themselves prefix-coded
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)

    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size

    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            repeat = br.read(2) + 3
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("WebP code-length repeat overflow")
                lengths[symbol] = prev_len
                symbol += 1
        elif cl == 17:
            symbol += br.read(3) + 3
        else:  # 18
            symbol += br.read(7) + 11
        if symbol > alphabet_size:
            raise ValueError("WebP code-length repeat overflow")
    return _PrefixCode(lengths)


def _build_code_lengths(freqs, limit: int = 15) -> list[int]:
    """Huffman code lengths, depth-limited. If plain Huffman exceeds
    ``limit`` (pathological skew), falls back to the balanced complete
    code (2^k - n symbols at k-1 bits, the rest at k)."""
    import heapq

    nz = [(f, s) for s, f in enumerate(freqs) if f > 0]
    lengths = [0] * len(freqs)
    if not nz:
        raise ValueError("empty histogram")
    if len(nz) == 1:
        lengths[nz[0][1]] = 1
        return lengths
    heap = [(f, (s,)) for f, s in nz]
    heapq.heapify(heap)
    depth = {s: 0 for _, s in nz}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    if max(depth.values()) > limit:
        n = len(nz)
        k = max(1, (n - 1).bit_length())
        short = (1 << k) - n
        for rank, (_, s) in enumerate(sorted(nz, key=lambda t: -t[0])):
            lengths[s] = k - 1 if rank < short else k
        return lengths
    for s, d in depth.items():
        lengths[s] = d
    return lengths


def _canonical_codes(lengths) -> dict[int, tuple[int, int]]:
    nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}  # zero-bit code
    max_len = max(ln for ln, _ in nz)
    bl_count = [0] * (max_len + 1)
    for ln, _ in nz:
        bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym in range(len(lengths)):
        ln = lengths[sym]
        if ln > 0:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _write_prefix_code(bw: _BitWriter, lengths) -> None:
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and all(s <= 255 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] <= 1:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # normal
    # emit every length literally with 17/18 zero-runs; CL code built
    # from the actual stream of CL symbols
    cl_stream: list[tuple[int, int, int]] = []  # (cl_sym, extra, extra_bits)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 3:
                if run >= 11:
                    take = min(run, 138)
                    cl_stream.append((18, take - 11, 7))
                else:
                    take = run
                    cl_stream.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                cl_stream.append((0, 0, 0))
            i = j
        else:
            cl_stream.append((lengths[i], 0, 0))
            i += 1
    cl_freq = [0] * 19
    for sym, _, _ in cl_stream:
        cl_freq[sym] += 1
    cl_lengths = _build_code_lengths(cl_freq, limit=7)
    # order coverage: emit enough of _CL_ORDER to include all used syms
    num_cl = 4
    for pos in range(19):
        if cl_lengths[_CL_ORDER[pos]] > 0:
            num_cl = max(num_cl, pos + 1)
    bw.write(num_cl - 4, 4)
    for pos in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[pos]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    codes = _canonical_codes(cl_lengths)
    single = len([1 for f in cl_freq if f]) == 1
    for sym, extra, extra_bits in cl_stream:
        code, ln = codes[sym]
        if not single:
            bw.write_code(code, ln)
        if extra_bits:
            bw.write(extra, extra_bits)


# --------------------------------------------------- LZ77 value coding


def _prefix_decode_value(sym: int, br: _BitReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode_value(value: int) -> tuple[int, int, int]:
    """value → (prefix_sym, extra_value, extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    u = value - 1
    nbits = u.bit_length() - 1
    sym = 2 * nbits + ((u >> (nbits - 1)) & 1)
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return sym, value - offset - 1, extra_bits


# --------------------------------------------------------- image stream


class _Transform:
    __slots__ = ("kind", "bits", "data", "palette")

    def __init__(self, kind, bits=0, data=None, palette=None):
        self.kind = kind
        self.bits = bits
        self.data = data
        self.palette = palette


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool, stats=None
):
    """Returns (argb uint32 array of xsize*ysize, transforms list,
    final_xsize) — transforms only at level 0."""
    transforms: list[_Transform] = []
    if is_level0:
        seen = set()
        while br.read(1):
            kind = br.read(2)
            if kind in seen:
                raise ValueError("WebP transform repeated")
            seen.add(kind)
            if kind in (_T_PREDICTOR, _T_COLOR):
                bits = br.read(3) + 2
                bw_ = _subsample_size(xsize, bits)
                bh_ = _subsample_size(ysize, bits)
                data, _, _ = _decode_image_stream(br, bw_, bh_, False)
                transforms.append(_Transform(kind, bits, data))
            elif kind == _T_SUBTRACT_GREEN:
                transforms.append(_Transform(kind))
            else:  # color indexing
                n_colors = br.read(8) + 1
                if n_colors > 16:
                    bits = 0
                elif n_colors > 4:
                    bits = 1
                elif n_colors > 2:
                    bits = 2
                else:
                    bits = 3
                raw, _, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are stored as per-channel deltas
                pal = np.cumsum(
                    raw.view(np.uint8).reshape(n_colors, 4), axis=0, dtype=np.uint32
                ).astype(np.uint8)
                transforms.append(
                    _Transform(kind, bits, palette=pal.copy().view(np.uint32).reshape(-1))
                )
                xsize = _subsample_size(xsize, bits)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid WebP color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = _subsample_size(xsize, meta_bits)
        meta_h = _subsample_size(ysize, meta_bits)
        mimg, _, _ = _decode_image_stream(br, meta_w, meta_h, False)
        # meta index = (red << 8) | green
        meta = (((mimg >> 16) & 0xFF) << 8 | ((mimg >> 8) & 0xFF)).astype(
            np.int64
        )
        n_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, green_alpha)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    n = xsize * ysize
    shift = 32 - cache_bits if cache_bits else 0
    single_group = n_groups == 1 and meta is None
    g0 = groups[0]
    n_lz77 = 0
    n_cache_hits = 0

    if single_group:
        # hot path: inlined bit buffer + flat LUTs, list-append output
        # (python-loop entropy decode; the scale lever is per-payload
        # parallelism — see module docstring)
        gsym, glen, gL = g0[0].tables()
        rsym, rlen, rL = g0[1].tables()
        bsym, blen, bL = g0[2].tables()
        asym, alen, aL = g0[3].tables()
        tsym, tlen, tL = g0[4].tables()
        gmask = (1 << gL) - 1
        rmask = (1 << rL) - 1
        bmask = (1 << bL) - 1
        amask = (1 << aL) - 1
        tmask = (1 << tL) - 1
        data = br.data
        dn = br.n
        bpos = br.pos
        buf = br.buf
        nbits = br.nbits
        outl: list[int] = []
        append = outl.append
        pos = 0
        while pos < n:
            while nbits < gL and bpos < dn:
                buf |= data[bpos] << nbits
                bpos += 1
                nbits += 8
            i = buf & gmask
            ln = glen[i]
            if ln > nbits:
                raise EOFError("WebP bitstream exhausted")
            buf >>= ln
            nbits -= ln
            s = gsym[i]
            if s < 256:
                while nbits < rL and bpos < dn:
                    buf |= data[bpos] << nbits
                    bpos += 1
                    nbits += 8
                i = buf & rmask
                ln = rlen[i]
                if ln > nbits:
                    raise EOFError("WebP bitstream exhausted")
                buf >>= ln
                nbits -= ln
                r = rsym[i]
                while nbits < bL and bpos < dn:
                    buf |= data[bpos] << nbits
                    bpos += 1
                    nbits += 8
                i = buf & bmask
                ln = blen[i]
                if ln > nbits:
                    raise EOFError("WebP bitstream exhausted")
                buf >>= ln
                nbits -= ln
                b = bsym[i]
                while nbits < aL and bpos < dn:
                    buf |= data[bpos] << nbits
                    bpos += 1
                    nbits += 8
                i = buf & amask
                ln = alen[i]
                if ln > nbits:
                    raise EOFError("WebP bitstream exhausted")
                buf >>= ln
                nbits -= ln
                pix = (asym[i] << 24) | (r << 16) | (s << 8) | b
                append(pix)
                pos += 1
                if cache_bits:
                    cache[(_HASH_MUL * pix & 0xFFFFFFFF) >> shift] = pix
            elif s < 280:
                s2 = s - 256
                if s2 < 4:
                    length = s2 + 1
                else:
                    extra = (s2 - 2) >> 1
                    while nbits < extra and bpos < dn:
                        buf |= data[bpos] << nbits
                        bpos += 1
                        nbits += 8
                    if extra > nbits:
                        raise EOFError("WebP bitstream exhausted")
                    length = ((2 + (s2 & 1)) << extra) + (
                        buf & ((1 << extra) - 1)
                    ) + 1
                    buf >>= extra
                    nbits -= extra
                while nbits < tL and bpos < dn:
                    buf |= data[bpos] << nbits
                    bpos += 1
                    nbits += 8
                i = buf & tmask
                ln = tlen[i]
                if ln > nbits:
                    raise EOFError("WebP bitstream exhausted")
                buf >>= ln
                nbits -= ln
                ds = tsym[i]
                if ds < 4:
                    dist_code = ds + 1
                else:
                    extra = (ds - 2) >> 1
                    while nbits < extra and bpos < dn:
                        buf |= data[bpos] << nbits
                        bpos += 1
                        nbits += 8
                    if extra > nbits:
                        raise EOFError("WebP bitstream exhausted")
                    dist_code = ((2 + (ds & 1)) << extra) + (
                        buf & ((1 << extra) - 1)
                    ) + 1
                    buf >>= extra
                    nbits -= extra
                if dist_code > 120:
                    dist = dist_code - 120
                else:
                    dx, dy = _DIST_TABLE[dist_code - 1]
                    dist = dy * xsize + dx
                    if dist < 1:
                        dist = 1
                if dist > pos or pos + length > n:
                    raise ValueError("invalid WebP backward reference")
                n_lz77 += 1
                src = pos - dist
                if cache_bits:
                    for k in range(length):
                        pix = outl[src + k]
                        append(pix)
                        cache[(_HASH_MUL * pix & 0xFFFFFFFF) >> shift] = pix
                else:
                    for k in range(length):
                        append(outl[src + k])
                pos += length
            else:
                idx = s - 280
                if idx >= cache_size:
                    raise ValueError("WebP color-cache index out of range")
                append(cache[idx])
                n_cache_hits += 1
                pos += 1
        br.pos = bpos
        br.buf = buf
        br.nbits = nbits
        out = np.array(outl, dtype=np.uint32)
        if stats is not None:
            stats["cache_bits"] = cache_bits
            stats["n_groups"] = n_groups
            stats["n_lz77"] = n_lz77
            stats["n_cache_hits"] = n_cache_hits
        return out, transforms, xsize

    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    x = 0
    while pos < n:
        y = pos // xsize
        gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
        green_c, red_c, blue_c, alpha_c, dist_c = groups[gi]
        s = green_c.decode(br)
        if s < 256:
            r = red_c.decode(br)
            b = blue_c.decode(br)
            a = alpha_c.decode(br)
            pix = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = pix
            if cache_bits:
                cache[(_HASH_MUL * pix & 0xFFFFFFFF) >> shift] = pix
            pos += 1
            x += 1
            if x == xsize:
                x = 0
        elif s < 280:
            length = _prefix_decode_value(s - 256, br)
            dsym = dist_c.decode(br)
            dist_code = _prefix_decode_value(dsym, br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_TABLE[dist_code - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("invalid WebP backward reference")
            n_lz77 += 1
            if cache_bits:
                for _ in range(length):
                    pix = int(out[pos - dist])
                    out[pos] = pix
                    cache[(_HASH_MUL * pix & 0xFFFFFFFF) >> shift] = pix
                    pos += 1
                    x += 1
                    if x == xsize:
                        x = 0
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
                    x += 1
                    if x == xsize:
                        x = 0
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("WebP color-cache index out of range")
            out[pos] = cache[idx]
            n_cache_hits += 1
            pos += 1
            x += 1
            if x == xsize:
                x = 0
    if stats is not None:
        stats["cache_bits"] = cache_bits
        stats["n_groups"] = n_groups
        stats["n_lz77"] = n_lz77
        stats["n_cache_hits"] = n_cache_hits
    return out, transforms, xsize


# --------------------------------------------------- inverse transforms


def _avg2(a: int, b: int) -> int:
    # per-channel (a + b) / 2 without unpacking: SWAR averaging
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_subtract_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _clamp_add_subtract_half(a: int, c: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        av = (a >> sh) & 0xFF
        d = av - ((c >> sh) & 0xFF)
        # C-style truncation toward zero
        half = d // 2 if d >= 0 else -((-d) // 2)
        v = av + half
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _select(left: int, top: int, topleft: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (0, 8, 16, 24):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (topleft >> sh) & 0xFF
        p = lc + tc - tlc
        p_l += abs(p - lc)
        p_t += abs(p - tc)
    return left if p_l < p_t else top


def _predict(mode, left, top, topleft, topright):
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _clamp_add_subtract_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_subtract_half(_avg2(left, top), topleft)
    raise ValueError(f"invalid WebP predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    # per-channel mod-256 addition without unpacking
    return (
        ((residual & 0x00FF00FF) + (pred & 0x00FF00FF)) & 0x00FF00FF
    ) | (
        ((residual & 0xFF00FF00) + (pred & 0xFF00FF00)) & 0xFF00FF00
    )


def _inv_predictor(pix: np.ndarray, w: int, h: int, t: _Transform) -> np.ndarray:
    bits = t.bits
    tiles_w = _subsample_size(w, bits)
    modes = ((t.data >> 8) & 0xFF).astype(np.int64)
    out = pix.copy()
    # row 0 fast path: pixel (0,0) predicted black, rest by LEFT — a
    # per-channel uint8 prefix sum
    row0 = out[:w].view(np.uint8).reshape(w, 4).copy()
    row0[0, 3] = (int(row0[0, 3]) + 0xFF) & 0xFF  # + 0xff000000 (ARGB LE)
    np.add.accumulate(row0, axis=0, dtype=np.uint8, out=row0)
    out[:w] = row0.reshape(-1).view(np.uint32)
    for y in range(1, h):
        base = y * w
        trow = (y >> bits) * tiles_w
        # leftmost pixel: predicted by TOP
        out[base] = _add_pixels(int(out[base]), int(out[base - w]))
        x = 1
        while x < w:
            tile = trow + (x >> bits)
            mode = int(modes[tile])
            xend = min(w, ((x >> bits) + 1) << bits)
            if mode == 2:
                # TOP predictor vectorizes over the tile span
                span = out[base + x : base + xend]
                above = out[base + x - w : base + xend - w]
                s8 = span.view(np.uint8)
                a8 = above.view(np.uint8)
                out[base + x : base + xend] = (
                    (s8 + a8).view(np.uint32)
                )
                x = xend
                continue
            while x < xend:
                i = base + x
                left = int(out[i - 1])
                top = int(out[i - w])
                topleft = int(out[i - w - 1])
                # x == w-1: i-w+1 == base, the already-decoded first
                # pixel of the CURRENT row (the spec's contiguous-
                # buffer top-right rule)
                topright = int(out[i - w + 1])
                pred = _predict(mode, left, top, topleft, topright)
                out[i] = _add_pixels(int(out[i]), pred)
                x += 1
    return out


def _inv_color(pix: np.ndarray, w: int, h: int, t: _Transform) -> np.ndarray:
    bits = t.bits
    tiles_w = _subsample_size(w, bits)
    cte = t.data
    g2r_t = (cte & 0xFF).astype(np.int32)
    g2b_t = ((cte >> 8) & 0xFF).astype(np.int32)
    r2b_t = ((cte >> 16) & 0xFF).astype(np.int32)
    # sign-extend int8
    for arr in (g2r_t, g2b_t, r2b_t):
        arr -= (arr > 127) * 256
    ys, xs = np.divmod(np.arange(w * h, dtype=np.int64), w)
    tidx = (ys >> bits) * tiles_w + (xs >> bits)
    g2r = g2r_t[tidx]
    g2b = g2b_t[tidx]
    r2b = r2b_t[tidx]
    a = (pix >> 24) & 0xFF
    r = ((pix >> 16) & 0xFF).astype(np.int32)
    g = ((pix >> 8) & 0xFF).astype(np.int32)
    b = (pix & 0xFF).astype(np.int32)
    g_s = g - (g > 127) * 256
    r = (r + ((g2r * g_s) >> 5)) & 0xFF
    r_s = r - (r > 127) * 256
    b = (b + ((g2b * g_s) >> 5) + ((r2b * r_s) >> 5)) & 0xFF
    return (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )


def _inv_subtract_green(pix: np.ndarray) -> np.ndarray:
    g = (pix >> 8) & 0xFF
    r = ((pix >> 16) & 0xFF) + g
    b = (pix & 0xFF) + g
    return (pix & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)


def _inv_palette(
    pix: np.ndarray, bundled_w: int, h: int, full_w: int, t: _Transform
) -> np.ndarray:
    pal = t.palette  # uint32 ARGB
    n_colors = len(pal)
    bits = t.bits
    idx = (pix >> 8) & 0xFF  # indices ride the green channel
    if bits:
        bpp = 8 >> bits
        per = 1 << bits
        sub = np.arange(per, dtype=np.uint32) * bpp
        wide = (
            idx.reshape(h, bundled_w)[:, :, None] >> sub[None, None, :]
        ) & ((1 << bpp) - 1)
        idx = wide.reshape(h, bundled_w * per)[:, :full_w].reshape(-1)
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("WebP palette index out of range")
    return pal[idx.astype(np.int64)]


# ------------------------------------------------------------- container


def _vp8l_decode(payload: bytes, stats=None) -> np.ndarray:
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream: bad signature")
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    pix, transforms, cur_w = _decode_image_stream(br, w, h, True, stats=stats)
    if stats is not None:
        stats["transforms"] = [t.kind for t in transforms]
        stats["width"] = w
        stats["height"] = h
    for t in reversed(transforms):
        if t.kind == _T_COLOR_INDEXING:
            pix = _inv_palette(pix, cur_w, h, w, t)
            cur_w = w
        elif t.kind == _T_SUBTRACT_GREEN:
            pix = _inv_subtract_green(pix)
        elif t.kind == _T_PREDICTOR:
            pix = _inv_predictor(pix, cur_w, h, t)
        else:
            pix = _inv_color(pix, cur_w, h, t)
    # ARGB uint32 → (H, W, 4) RGBA uint8
    out = np.empty((h * cur_w, 4), dtype=np.uint8)
    out[:, 0] = (pix >> 16) & 0xFF
    out[:, 1] = (pix >> 8) & 0xFF
    out[:, 2] = pix & 0xFF
    out[:, 3] = (pix >> 24) & 0xFF
    return out.reshape(h, cur_w, 4)


def _walk_riff(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP: bad RIFF header")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise EOFError("truncated WebP RIFF payload")
    pos = 12
    end = min(len(data), riff_size + 8)
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if body_at + size > end:
            raise EOFError(f"truncated WebP chunk {fourcc!r}")
        yield fourcc, data[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # RIFF pads to even


def parse_webp(data: bytes) -> dict:
    """Structural census (m01 metadata surface): container flavor,
    canvas dimensions, chunk walk, feature flags, animation frame
    count, metadata chunk presence."""
    chunks = []
    info = {
        "format": None,
        "width": None,
        "height": None,
        "has_alpha": False,
        "n_frames": 0,
        "has_exif": False,
        "has_xmp": False,
        "has_iccp": False,
        "chunks": chunks,
    }
    for fourcc, body in _walk_riff(data):
        name = fourcc.decode("ascii", "replace")
        chunks.append(name)
        if fourcc == b"VP8L":
            info["format"] = info["format"] or "lossless"
            if len(body) < 5 or body[0] != 0x2F:
                raise ValueError("bad VP8L chunk")
            bits = struct.unpack_from("<I", body, 1)[0]
            if info["width"] is None:
                info["width"] = (bits & 0x3FFF) + 1
                info["height"] = ((bits >> 14) & 0x3FFF) + 1
            info["has_alpha"] = info["has_alpha"] or bool((bits >> 28) & 1)
            info["n_frames"] = max(info["n_frames"], 1)
        elif fourcc == b"VP8 ":
            info["format"] = info["format"] or "lossy"
            # keyframe: 3-byte frame tag, then sync 9D 01 2A, then dims
            if len(body) >= 10 and body[3:6] == b"\x9d\x01\x2a":
                wraw, hraw = struct.unpack_from("<HH", body, 6)
                if info["width"] is None:
                    info["width"] = wraw & 0x3FFF
                    info["height"] = hraw & 0x3FFF
            info["n_frames"] = max(info["n_frames"], 1)
        elif fourcc == b"VP8X":
            info["format"] = "extended"
            if len(body) < 10:
                raise ValueError("bad VP8X chunk")
            flags = body[0]
            info["has_iccp"] = bool(flags & 0x20)
            info["has_alpha"] = bool(flags & 0x10)
            info["has_exif"] = bool(flags & 0x08)
            info["has_xmp"] = bool(flags & 0x04)
            w = 1 + (body[4] | (body[5] << 8) | (body[6] << 16))
            h = 1 + (body[7] | (body[8] << 8) | (body[9] << 16))
            info["width"], info["height"] = w, h
        elif fourcc == b"ANMF":
            info["n_frames"] += 1
        elif fourcc == b"EXIF":
            info["has_exif"] = True
        elif fourcc == b"XMP ":
            info["has_xmp"] = True
        elif fourcc == b"ALPH":
            info["has_alpha"] = True
    if info["format"] is None:
        raise ValueError("WebP without an image chunk")
    return info


def exif_payload(data: bytes) -> bytes | None:
    """Raw EXIF chunk bytes (a TIFF structure — m21 feeds these to the
    tiff.py IFD walker), or None."""
    for fourcc, body in _walk_riff(data):
        if fourcc == b"EXIF":
            return body
    return None


def decode_webp(data: bytes, stats: dict | None = None) -> np.ndarray:
    """Decode a lossless WebP to (H, W, 4) RGBA uint8. Lossy VP8 pixel
    decode is documented out (census via parse_webp); extended files
    decode when they carry a VP8L chunk."""
    ensure_flat_malloc()
    for fourcc, body in _walk_riff(data):
        if fourcc == b"VP8L":
            return _vp8l_decode(body, stats=stats)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 pixel decode out of scope (DCT/bool-coder "
                "build — pyav territory); parse_webp gives the census"
            )
    raise ValueError("WebP without an image chunk")


def decode_webp_alpha(data: bytes) -> np.ndarray:
    """Decode the ALPH chunk of an extended WebP to an (H, W) uint8
    alpha plane. Compression 0 (raw) and 1 (VP8L image stream whose
    green channel carries alpha) both decode; the 4 post-filters
    (none/horizontal/vertical/gradient) are inverted per spec."""
    info = parse_webp(data)
    w, h = info["width"], info["height"]
    alph = None
    for fourcc, body in _walk_riff(data):
        if fourcc == b"ALPH":
            alph = body
            break
    if alph is None:
        raise ValueError("WebP without an ALPH chunk")
    if not alph:
        raise EOFError("empty ALPH chunk")
    head = alph[0]
    compression = head & 3
    filt = (head >> 2) & 3
    if compression == 0:
        if len(alph) < 1 + w * h:
            raise EOFError("truncated raw alpha plane")
        plane = np.frombuffer(
            alph, dtype=np.uint8, count=w * h, offset=1
        ).reshape(h, w).copy()
    elif compression == 1:
        br = _BitReader(alph, 1)
        pix, transforms, cur_w = _decode_image_stream(br, w, h, True)
        for t in reversed(transforms):
            if t.kind == _T_COLOR_INDEXING:
                pix = _inv_palette(pix, cur_w, h, w, t)
                cur_w = w
            elif t.kind == _T_SUBTRACT_GREEN:
                pix = _inv_subtract_green(pix)
            elif t.kind == _T_PREDICTOR:
                pix = _inv_predictor(pix, cur_w, h, t)
            else:
                pix = _inv_color(pix, cur_w, h, t)
        plane = ((pix >> 8) & 0xFF).astype(np.uint8).reshape(h, w)
    else:
        raise ValueError(f"invalid alpha compression {compression}")
    if filt:
        out = plane.astype(np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                elif filt == 1:
                    pred = out[y, x - 1]
                elif filt == 2:
                    pred = out[y - 1, x]
                else:
                    g = out[y, x - 1] + out[y - 1, x] - out[y - 1, x - 1]
                    pred = 0 if g < 0 else (255 if g > 255 else g)
                out[y, x] = (out[y, x] + pred) & 0xFF
        plane = out.astype(np.uint8)
    return plane


# ---------------------------------------------------------------- encoder


def _to_argb(img: np.ndarray) -> tuple[np.ndarray, int, int, bool]:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img, img, img], axis=2)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    has_alpha = img.shape[2] == 4
    a = (
        img[:, :, 3].astype(np.uint32)
        if has_alpha
        else np.full((h, w), 255, dtype=np.uint32)
    )
    pix = (
        (a << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    )
    return pix.reshape(-1), w, h, has_alpha


def _fwd_subtract_green(pix: np.ndarray) -> np.ndarray:
    g = (pix >> 8) & 0xFF
    r = ((pix >> 16) & 0xFF) - g
    b = (pix & 0xFF) - g
    return (pix & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)


def _sub_pixels(pixel: int, pred: int) -> int:
    return (
        ((pixel | 0x01000100) - (pred & 0x00FF00FF)) & 0x00FF00FF
    ) | (
        (((pixel >> 8) | 0x01000100) - ((pred >> 8) & 0x00FF00FF)) & 0x00FF00FF
    ) << 8


def _fwd_predictor(pix: np.ndarray, w: int, h: int, mode: int) -> np.ndarray:
    out = np.empty_like(pix)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(pix[i - 1])
            elif x == 0:
                pred = int(pix[i - w])
            else:
                left = int(pix[i - 1])
                top = int(pix[i - w])
                topleft = int(pix[i - w - 1])
                topright = int(pix[i - w + 1])  # x==w-1 wraps per spec
                pred = _predict(mode, left, top, topleft, topright)
            out[i] = _sub_pixels(int(pix[i]), pred)
    return out


def _fwd_color(pix: np.ndarray, g2r: int, g2b: int, r2b: int) -> np.ndarray:
    r = ((pix >> 16) & 0xFF).astype(np.int32)
    g = ((pix >> 8) & 0xFF).astype(np.int32)
    b = (pix & 0xFF).astype(np.int32)
    g_s = g - (g > 127) * 256
    r_s0 = r - (r > 127) * 256
    new_r = (r - ((np.int32(g2r) * g_s) >> 5)) & 0xFF
    new_b = (b - ((np.int32(g2b) * g_s) >> 5) - ((np.int32(r2b) * r_s0) >> 5)) & 0xFF
    return (
        (pix & 0xFF00FF00)
        | (new_r.astype(np.uint32) << 16)
        | new_b.astype(np.uint32)
    )


def _encode_image_data(
    bw: _BitWriter,
    pix: np.ndarray,
    xsize: int,
    ysize: int,
    is_level0: bool,
    cache_bits: int = 0,
    use_lz77: bool = True,
    meta_bits: int | None = None,
    group_map: np.ndarray | None = None,
) -> None:
    """Entropy-code pixels (no transforms here). ``group_map``: per-tile
    group index array when ``meta_bits`` is set (level 0 only)."""
    n = len(pix)
    cache_size = (1 << cache_bits) if cache_bits else 0
    shift = 32 - cache_bits if cache_bits else 0
    cache = [0] * cache_size

    if meta_bits is not None:
        meta_w = _subsample_size(xsize, meta_bits)
        n_groups = int(group_map.max()) + 1
    else:
        meta_w = 0
        n_groups = 1

    # tokenize: (0, a, r, g, b) literal / (1, len_sym, len_extra,
    # len_bits, dist_sym, dist_extra, dist_bits) copy / (2, idx) cache
    tokens: list[tuple] = []
    token_groups: list[int] = []
    pos = 0
    while pos < n:
        if meta_bits is not None:
            y, x = divmod(pos, xsize)
            gi = int(group_map[(y >> meta_bits) * meta_w + (x >> meta_bits)])
        else:
            gi = 0
        best_len = 0
        best_dist = 0
        if use_lz77 and pos:
            for dist in (1, xsize):
                if dist > pos:
                    continue
                ln = 0
                cap = min(n - pos, 4096)
                while ln < cap and pix[pos + ln] == pix[pos + ln - dist]:
                    ln += 1
                if ln > best_len:
                    best_len = ln
                    best_dist = dist
        if best_len >= 4:
            ls, le, lb = _prefix_encode_value(best_len)
            dy, dx = divmod(best_dist, xsize) if best_dist >= xsize else (0, best_dist)
            code = _DIST_CODE_OF.get((dx, dy))
            dist_code = code if code is not None else best_dist + 120
            ds, de, db = _prefix_encode_value(dist_code)
            tokens.append((1, ls, le, lb, ds, de, db))
            token_groups.append(gi)
            if cache_bits:
                for k in range(best_len):
                    p = int(pix[pos + k])
                    cache[(_HASH_MUL * p & 0xFFFFFFFF) >> shift] = p
            pos += best_len
            continue
        p = int(pix[pos])
        idx = (_HASH_MUL * p & 0xFFFFFFFF) >> shift if cache_bits else 0
        if cache_bits and cache[idx] == p and pos > 0:
            tokens.append((2, idx))
        else:
            tokens.append(
                (0, (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
            )
            if cache_bits:
                cache[idx] = p
        token_groups.append(gi)
        pos += 1

    # histograms per group
    green_alpha = 256 + 24 + cache_size
    hists = [
        [
            [0] * green_alpha,
            [0] * 256,
            [0] * 256,
            [0] * 256,
            [0] * 40,
        ]
        for _ in range(n_groups)
    ]
    for tok, gi in zip(tokens, token_groups):
        hg, hr, hb, ha, hd = hists[gi]
        if tok[0] == 0:
            _, a, r, g, b = tok
            hg[g] += 1
            hr[r] += 1
            hb[b] += 1
            ha[a] += 1
        elif tok[0] == 1:
            hg[256 + tok[1]] += 1
            hd[tok[4]] += 1
        else:
            hg[280 + tok[1]] += 1
    # every code must be writable: ensure non-empty histograms
    for hg, hr, hb, ha, hd in hists:
        for hist in (hg, hr, hb, ha, hd):
            if not any(hist):
                hist[0] = 1

    # stream header bits
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_level0:
        if meta_bits is not None:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            meta_pix = (
                0xFF000000
                | ((group_map.astype(np.uint32) & 0xFF) << 8)
                | ((group_map.astype(np.uint32) >> 8) << 16)
            )
            _encode_image_data(
                bw,
                meta_pix,
                meta_w,
                _subsample_size(ysize, meta_bits),
                False,
                use_lz77=True,
            )
        else:
            bw.write(0, 1)

    group_codes = []
    for hg, hr, hb, ha, hd in hists:
        codes = []
        for hist, limit in (
            (hg, 15),
            (hr, 15),
            (hb, 15),
            (ha, 15),
            (hd, 15),
        ):
            lengths = _build_code_lengths(hist, limit)
            _write_prefix_code(bw, lengths)
            cc = _canonical_codes(lengths)
            single = len(cc) == 1
            codes.append((cc, single))
        group_codes.append(codes)

    for tok, gi in zip(tokens, token_groups):
        (gcc, gs), (rcc, rs), (bcc, bs), (acc, as_), (dcc, ds_) = group_codes[gi]
        if tok[0] == 0:
            _, a, r, g, b = tok
            if not gs:
                bw.write_code(*gcc[g])
            if not rs:
                bw.write_code(*rcc[r])
            if not bs:
                bw.write_code(*bcc[b])
            if not as_:
                bw.write_code(*acc[a])
        elif tok[0] == 1:
            _, ls, le, lb, dsym, de, db = tok
            if not gs:
                bw.write_code(*gcc[256 + ls])
            if lb:
                bw.write(le, lb)
            if not ds_:
                bw.write_code(*dcc[dsym])
            if db:
                bw.write(de, db)
        else:
            if not gs:
                bw.write_code(*gcc[280 + tok[1]])


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: int | None = None,
    predictor_bits: int = 6,
    color: tuple[int, int, int] | None = None,
    color_bits: int = 6,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = True,
    meta_bits: int | None = None,
    n_meta_groups: int = 2,
    exif: bytes | None = None,
) -> bytes:
    """Deterministic lossless WebP (VP8L) writer. ``img``: (H, W) gray,
    (H, W, 3) RGB, or (H, W, 4) RGBA uint8. Transform combos, the
    color cache, LZ77, and meta prefix groups are all selectable so
    fixtures can exercise each decoder path. LOSSLESS:
    decode_webp(encode_webp(img)) reproduces img exactly."""
    pix, w, h, has_alpha = _to_argb(img)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    cur_w = w
    if palette:
        colors = np.unique(pix)
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError("palette encode needs <= 256 distinct colors")
        if subtract_green or predictor is not None or color is not None:
            raise ValueError("palette does not combine with other transforms")
        lut = {int(c): i for i, c in enumerate(colors)}
        idx = np.array([lut[int(p)] for p in pix], dtype=np.uint32)
        if n_colors > 16:
            bits = 0
        elif n_colors > 4:
            bits = 1
        elif n_colors > 2:
            bits = 2
        else:
            bits = 3
        bw.write(1, 1)
        bw.write(_T_COLOR_INDEXING, 2)
        bw.write(n_colors - 1, 8)
        # palette entries as per-channel deltas, entropy-coded
        pal8 = colors.astype(np.uint32).view(np.uint8).reshape(n_colors, 4)
        deltas = np.diff(
            np.concatenate([np.zeros((1, 4), np.uint8), pal8]).astype(np.int16),
            axis=0,
        ).astype(np.uint8)
        # deltas are in uint32 little-endian byte order [b, g, r, a]
        delta_pix = (
            deltas[:, 0].astype(np.uint32)
            | (deltas[:, 1].astype(np.uint32) << 8)
            | (deltas[:, 2].astype(np.uint32) << 16)
            | (deltas[:, 3].astype(np.uint32) << 24)
        )
        _encode_image_data(bw, delta_pix, n_colors, 1, False, use_lz77=False)
        if bits:
            bpp = 8 >> bits
            per = 1 << bits
            bundled_w = _subsample_size(w, bits)
            padded = np.zeros((h, bundled_w * per), dtype=np.uint32)
            padded[:, :w] = idx.reshape(h, w)
            packed = np.zeros((h, bundled_w), dtype=np.uint32)
            for k in range(per):
                packed |= padded[:, k::per] << (k * bpp)
            pix = (0xFF000000 | (packed << 8)).reshape(-1)
            cur_w = bundled_w
        else:
            pix = (0xFF000000 | (idx << 8)).reshape(-1)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(_T_SUBTRACT_GREEN, 2)
            pix = _fwd_subtract_green(pix)
        if predictor is not None:
            bw.write(1, 1)
            bw.write(_T_PREDICTOR, 2)
            bw.write(predictor_bits - 2, 3)
            tw = _subsample_size(w, predictor_bits)
            th = _subsample_size(h, predictor_bits)
            pix = _fwd_predictor(pix, w, h, predictor)
            tile_pix = np.full(
                tw * th, 0xFF000000 | (predictor << 8), dtype=np.uint32
            )
            _encode_image_data(bw, tile_pix, tw, th, False, use_lz77=True)
        if color is not None:
            g2r, g2b, r2b = color
            bw.write(1, 1)
            bw.write(_T_COLOR, 2)
            bw.write(color_bits - 2, 3)
            tw = _subsample_size(w, color_bits)
            th = _subsample_size(h, color_bits)
            pix = _fwd_color(pix, g2r, g2b, r2b)
            cte = (
                0xFF000000
                | ((r2b & 0xFF) << 16)
                | ((g2b & 0xFF) << 8)
                | (g2r & 0xFF)
            )
            tile_pix = np.full(tw * th, cte, dtype=np.uint32)
            _encode_image_data(bw, tile_pix, tw, th, False, use_lz77=True)
    bw.write(0, 1)  # no more transforms

    group_map = None
    if meta_bits is not None:
        mw = _subsample_size(cur_w, meta_bits)
        mh = _subsample_size(h, meta_bits)
        tiles = np.arange(mw * mh, dtype=np.int64)
        group_map = ((tiles % mw) + tiles // mw) % n_meta_groups
    _encode_image_data(
        bw,
        pix,
        cur_w,
        h,
        True,
        cache_bits=cache_bits,
        use_lz77=use_lz77,
        meta_bits=meta_bits,
        group_map=group_map,
    )
    payload = bw.finish()

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    if exif is not None:
        # extended container: VP8X (EXIF + alpha flags, 24-bit LE
        # canvas minus-one dims) + image chunk + EXIF chunk
        flags = 0x08 | (0x10 if has_alpha else 0)
        vp8x = (
            b"VP8X"
            + struct.pack("<I", 10)
            + bytes([flags])
            + b"\x00\x00\x00"
            + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3]
        )
        exif_chunk = b"EXIF" + struct.pack("<I", len(exif)) + exif
        if len(exif) & 1:
            exif_chunk += b"\x00"
        chunk = vp8x + chunk + exif_chunk
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

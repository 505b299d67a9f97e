"""Vendored pure-Python GIF codec (round 9 — after JPEG baseline/
progressive and PNG, GIF is the remaining image format real crawls hit
at volume, and the dominant short-animation container).

Like FLAC and PNG, the whole format is structural — every line derives
from the public GIF89a specification: logical screen descriptor,
global/local color tables, image descriptors, graphic-control /
comment / application extensions, sub-block framing, Adam-style 4-pass
interlacing, and variable-width LZW with a growing dictionary (3-12
bit codes, clear/end codes). There are ZERO constant tables, and the
format is LOSSLESS over palette indices, so decode(encode(frames)) must
reproduce the index streams exactly — the same invertible-oracle shape
as m08/m17.

Decoder coverage: GIF87a/GIF89a, global + per-frame local color
tables, multi-frame animations with graphic-control extensions
(delay / disposal / transparency index surfaced, not composited —
frames decode standalone, the census semantics), NETSCAPE loop
extension, interlaced frames, full LZW (width growth to 12 bits,
dictionary reset on clear, deferred-clear streams), truncation /
bad-code / missing-trailer error taxonomy.

Encoder (fixture generator): real LZW compression (hash-dict, width
growth, 12-bit cap with emitted clear codes) — a strict subset of the
decoder's surface so round-trips exercise the growth paths, not just
literal codes — plus interlace and multi-frame/GCE/loop writing.

100 TB shape: decode is embarrassingly parallel per payload inside
Arrow-batched mapInPandas (the m08 pattern); payloads never shuffle.
LZW's dictionary build is inherently serial per stream (each code can
reference the string created one step earlier), but r10 showed the
serial part is narrower than r9 documented: code EXTRACTION
vectorizes (bit positions are content-independent between
width-growth points), literal stretches bulk-write, and entry
expansions are contiguous output slices — see _lzw_decode. The
per-payload lever still dominates at scale; the scalar reference
decoder below it is the differential-test oracle.

Reference parity note: the reference engine has no codec surface; this
module belongs to the beyond-reference multimodal family (m18).
"""

from __future__ import annotations

import struct

import numpy as np

from tectonic_spark.operators.arena import ensure_flat_malloc

_MAGIC87 = b"GIF87a"
_MAGIC89 = b"GIF89a"

# 4-pass interlace row schedule per spec appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# -------------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW -> index array of exactly ``n_pixels``
    entries (r10 vectorized-extraction engine — VERDICT r9 item 4).

    Two structural facts make this fast without changing semantics:

    1. **Code positions are content-independent between width-growth
       points.** The dictionary grows by exactly one entry per code
       consumed (after the first code following a CLEAR), so the code
       width — and therefore every code's bit offset — is a pure
       function of the count of codes since the last CLEAR. Codes in
       a constant-width run are bit-sliced from the stream in ONE
       numpy gather (3-byte window >> shift & mask); only a CLEAR
       invalidates the tail of an extracted run, and clears are rare
       (every ~3800 codes from real encoders).
    2. **Every dictionary entry's expansion is a contiguous slice of
       the already-decoded output.** The entry created at step t is
       prev + head(cur) = output[start(t-1) : start(t)+1]. So the
       serial loop needs no byte-string dictionary at all — just the
       per-step output offsets — and each code emission is one
       bytearray slice copy (memcpy) instead of bytes concatenation
       plus a new table entry.

    Implements width growth to 12 bits, CLEAR reset, EOI, the cScSc
    just-created-entry case, and tolerates deferred clears (dictionary
    pinned full at 4096 per the 89a errata). Error taxonomy identical
    to the scalar reference below, which remains the differential-test
    oracle."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray(n_pixels)
    pos = 0
    d = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    d = np.concatenate([d, np.zeros(3, dtype=np.int32)])
    total_bits = len(data) * 8
    bitpos = 0
    width = min_code_size + 1
    size = end + 1
    j = 0  # codes consumed since last CLEAR
    seg_pos: list[int] = []  # output offset where step-t's segment starts
    while pos < n_pixels:
        # codes until the next width change, assuming no CLEAR arrives;
        # the saturated-dictionary regime is chunked (a CLEAR usually
        # arrives right after saturation — extracting the whole rest of
        # the stream would be discarded work)
        if size >= 4096:
            m = min((total_bits - bitpos) // width, 4096)
        else:
            m = (1 << width) - size + (1 if j == 0 else 0)
            m = min(m, (total_bits - bitpos) // width)
        if m <= 0:
            raise EOFError("GIF LZW data exhausted")
        p = bitpos + np.arange(m, dtype=np.int64) * width
        b0 = (p >> 3).astype(np.int64)
        arr = (
            ((d[b0] | (d[b0 + 1] << 8) | (d[b0 + 2] << 16)) >> (p & 7))
            & ((1 << width) - 1)
        )
        # literals (code < clear) are self-identifying in the code
        # array; bulk-write each literal stretch in one slice (their
        # dictionary entries are consecutive 1-byte segments, so the
        # bookkeeping vectorizes too) and fall to scalar handling only
        # at the sparse non-literal codes
        lit_bytes = arr.astype(np.uint8).tobytes()
        nl_idx = np.nonzero(arr >= clear)[0]
        nl_codes = dict(zip(nl_idx.tolist(), arr[nl_idx].tolist()))
        nonlit = list(nl_codes)
        nonlit.append(m)
        consumed = 0
        reset = False
        ended = False
        stop = False
        idx = 0
        for nl in nonlit:
            k = nl - idx
            if k and j == 0:  # run's first code: creates no entry
                code = lit_bytes[idx]
                out[pos] = code
                seg_pos = [pos]
                pos += 1
                j = 1
                idx += 1
                k -= 1
                if pos >= n_pixels:
                    consumed = idx
                    stop = True
                    break
            if k:
                if pos + k >= n_pixels:  # fills the image: write & stop
                    k = n_pixels - pos
                    out[pos : pos + k] = lit_bytes[idx : idx + k]
                    pos += k
                    consumed = idx + k
                    stop = True
                    break
                out[pos : pos + k] = lit_bytes[idx : idx + k]
                if size < 4096:
                    n_app = 4096 - size
                    n_app = k if k < n_app else n_app
                    seg_pos.extend(range(pos, pos + n_app))
                    size += n_app
                j += k
                pos += k
                idx = nl
            if nl == m:
                consumed = m
                break
            code = nl_codes[nl]
            consumed = nl + 1
            idx = nl + 1
            if code == clear:
                reset = True
                break
            if code == end:
                ended = True
                break
            if j == 0 or code > size or (code == size and size >= 4096):
                raise ValueError("invalid GIF LZW code")
            if code < size:
                t = code - end
                s = seg_pos[t - 1]
                e = seg_pos[t] + 1
                length = e - s
                if pos + length > n_pixels:
                    raise ValueError("GIF pixel overflow")
                out[pos : pos + length] = out[s:e]
            else:
                # cScSc: prev + prev[0]; prev is the previous segment
                s = seg_pos[j - 1]
                lp = pos - s
                length = lp + 1
                if pos + length > n_pixels:
                    raise ValueError("GIF pixel overflow")
                out[pos : pos + lp] = out[s:pos]
                out[pos + lp] = out[s]
            if size < 4096:
                seg_pos.append(pos)
                size += 1
            j += 1
            pos += length
            if pos >= n_pixels:
                stop = True
                break
        bitpos += consumed * width
        if ended or stop:
            break
        if reset:
            width = min_code_size + 1
            size = end + 1
            j = 0
            seg_pos = []
            continue
        if consumed == m and size < 4096 and size == (1 << width) and width < 12:
            width += 1
    if pos < n_pixels:
        raise EOFError("GIF LZW data exhausted")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _lzw_decode_scalar(
    data: bytes, min_code_size: int, n_pixels: int
) -> np.ndarray:
    """Scalar reference LZW decoder (the r9 implementation) — kept as
    the differential-test oracle for the vectorized engine above.
    Implements width growth (up to 12 bits), dictionary reset on
    CLEAR, the end-of-information code, and tolerates deferred clears
    (dictionary pinned full at 4096 until the encoder sends CLEAR, per
    the 89a errata)."""
    clear = 1 << min_code_size
    end = clear + 1
    # accumulate decoded indices in a bytearray (ONE numpy conversion at
    # the end): a per-code numpy slice-assign costs ~1 us of dispatch on
    # typically 1-3 byte expansions and dominated the first version
    res = bytearray()
    # dictionary: per-entry fully-expanded bytes, rebuilt on clear.
    # Storing expansions (vs prefix links) makes each emission one
    # bytearray += instead of a per-byte link walk; total stored bytes
    # across a 4096-entry dictionary are bounded by the classic
    # sum-of-lengths (<= ~8 MB worst case, typically a few hundred KB),
    # and the table is rebuilt from scratch on clear.
    table: list[bytes] = [b""] * 4096
    for i in range(clear):
        table[i] = bytes([i])
    size = end + 1
    width = min_code_size + 1
    prev: bytes | None = None
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    mask = (1 << width) - 1
    while len(res) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise EOFError("GIF LZW data exhausted")
            buf |= data[pos] << nbits  # LSB-first packing per spec
            pos += 1
            nbits += 8
        code = buf & mask
        buf >>= width
        nbits -= width
        if code == clear:
            size = end + 1
            width = min_code_size + 1
            mask = (1 << width) - 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("invalid GIF LZW code")
            prev = table[code]
            res += prev
            continue
        if code > size or (code == size and size >= 4096):
            raise ValueError("invalid GIF LZW code")
        cur = prev + prev[:1] if code == size else table[code]
        res += cur
        if size < 4096:
            table[size] = prev + cur[:1]
            size += 1
            if size == (1 << width) and width < 12:
                width += 1
                mask = (1 << width) - 1
        prev = cur
    if len(res) < n_pixels:
        raise EOFError("GIF LZW data exhausted")
    if len(res) > n_pixels:
        raise ValueError("GIF pixel overflow")
    return np.frombuffer(bytes(res), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW compression (hash-dict), deterministic: emits CLEAR,
    grows the dictionary and code width, emits CLEAR + resets when the
    dictionary fills (the decoder tolerates deferred clears from
    third-party encoders; ours clears immediately), ends with END — so
    round-trips exercise the decoder's growth and reset paths."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict = {}
    size = end + 1  # mirrors the decoder's dictionary size exactly
    emit(clear)
    seq = None
    for v in map(int, indices):
        if seq is None:
            seq = v
            continue
        key = (seq, v)
        nxt = table.get(key)
        if nxt is not None:
            seq = nxt
            continue
        emit(seq)
        # keep width in lockstep with the DECODER, whose entry counter
        # lags the encoder's by one (it creates no entry on the first
        # code after a clear): the decoder reading code j+1 has added
        # entries through end+j, so it widens one emission later than
        # the encoder's entry count alone would suggest — hence +1
        if size < 4096:
            table[key] = size
            size += 1
            if size == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            size = end + 1
            width = min_code_size + 1
        seq = v
    if seq is not None:
        emit(seq)
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise EOFError("truncated GIF sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        if pos + ln > n:
            raise EOFError("truncated GIF sub-blocks")
        out.extend(data[pos : pos + ln])
        pos += ln


# ---------------------------------------------------------------- encoder


def encode_gif(
    frames,
    palette: np.ndarray,
    width: int | None = None,
    height: int | None = None,
    interlace=False,
    loop: int | None = None,
    delays=None,
    local_palettes=None,
    transparent: int | None = None,
) -> bytes:
    """Deterministic GIF writer. ``frames``: one (H, W) uint8 index
    array or a list of them (multi-frame animation, all full-screen at
    (0,0)); ``palette``: (n<=256, 3) uint8 global color table;
    ``local_palettes``: optional per-frame color tables; ``interlace``:
    bool or per-frame list; ``loop`` adds the NETSCAPE application
    extension; ``delays``/``transparent`` add per-frame graphic-control
    extensions. LOSSLESS over indices."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if isinstance(interlace, bool):
        interlace = [interlace] * len(frames)
    H, W = frames[0].shape
    width = W if width is None else width
    height = H if height is None else height
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    gct_bits = max(1, int(len(pal) - 1).bit_length())
    out = bytearray()
    out += _MAGIC89 if (loop is not None or delays or transparent is not None) else _MAGIC87
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((gct_bits - 1) & 7))  # GCT present, size bits
    out.append(0)  # background color index
    out.append(0)  # pixel aspect
    full = np.zeros(((1 << gct_bits), 3), dtype=np.uint8)
    full[: len(pal)] = pal
    out += full.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += _sub_blocks(struct.pack("<BH", 1, loop))[:-1]  # keep own 0
        out += b"\x00"
    for k, fr in enumerate(frames):
        fr = np.asarray(fr, dtype=np.uint8)
        fh, fw = fr.shape
        il = interlace[k]
        lp = None if local_palettes is None else local_palettes[k]
        if delays is not None or transparent is not None:
            flags = 0x01 if transparent is not None else 0
            out += b"\x21\xf9\x04"
            out += struct.pack(
                "<BHB",
                flags,
                0 if delays is None else int(delays[k]),
                transparent or 0,
            )
            out += b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh)
        if lp is not None:
            lp = np.asarray(lp, dtype=np.uint8)
            lbits = max(1, int(len(lp) - 1).bit_length())
            out.append(0x80 | (0x40 if il else 0) | ((lbits - 1) & 7))
            fl = np.zeros(((1 << lbits), 3), dtype=np.uint8)
            fl[: len(lp)] = lp
            out += fl.tobytes()
            ncolors = len(lp)
        else:
            out.append(0x40 if il else 0)
            ncolors = len(pal)
        if int(fr.max(initial=0)) >= ncolors:
            raise ValueError("frame index exceeds palette")
        rows = fr
        if il:
            order = []
            for start, step in _INTERLACE:
                order.extend(range(start, fh, step))
            rows = fr[np.asarray(order)]
        mcs = max(2, int(ncolors - 1).bit_length())
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------- decoder


def decode_gif(data: bytes) -> dict:
    """Decode every frame to raw palette indices + resolved RGB.
    Returns {width, height, version, loop, frames: [{left, top,
    indices (h, w) uint8, rgb (h, w, 3) uint8, interlaced, delay,
    transparent}]}. Frames decode standalone (census semantics — no
    disposal compositing; the raw per-frame data IS the lossless
    surface the oracle pins)."""
    ensure_flat_malloc()
    if data[:6] not in (_MAGIC87, _MAGIC89):
        raise ValueError("not a GIF: bad signature")
    version = data[3:6].decode("ascii")
    if len(data) < 13:
        raise EOFError("truncated GIF header")
    width, height = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(data):
            raise EOFError("truncated GIF color table")
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    frames = []
    loop = None
    delay = None
    transparent = None
    disposal = None
    saw_trailer = False
    n_data = len(data)
    while pos < n_data:
        b = data[pos]
        pos += 1
        if b == 0x3B:
            saw_trailer = True
            break
        if b == 0x21:  # extension
            if pos >= n_data:
                raise EOFError("truncated GIF extension")
            label = data[pos]
            pos += 1
            payload, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags, d, t = struct.unpack_from("<BHB", payload, 0)
                delay = d
                transparent = t if flags & 1 else None
                disposal = (flags >> 2) & 7
            elif label == 0xFF and payload[:11] == b"NETSCAPE2.0":
                if len(payload) >= 14:
                    loop = struct.unpack_from("<H", payload, 12)[0]
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        if pos + 9 > n_data:
            raise EOFError("truncated GIF image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        fpacked = data[pos + 8]
        pos += 9
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            if pos + 3 * n > n_data:
                raise EOFError("truncated GIF color table")
            table = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame without any color table")
        if pos >= n_data:
            raise EOFError("truncated GIF image data")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"invalid GIF LZW minimum code size {mcs}")
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)
        interlaced = bool(fpacked & 0x40)
        if interlaced:
            order = []
            for start, step in _INTERLACE:
                order.extend(range(start, fh, step))
            deint = np.empty_like(idx)
            deint[np.asarray(order)] = idx
            idx = deint
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF index exceeds color table")
        frames.append(
            {
                "left": left,
                "top": top,
                "indices": idx,
                "rgb": table[idx],
                "interlaced": interlaced,
                "delay": delay,
                "transparent": transparent,
                "disposal": disposal,
            }
        )
        delay = None
        transparent = None
        disposal = None
    if not saw_trailer:
        raise EOFError("missing GIF trailer")
    if not frames:
        raise ValueError("GIF with no image data")
    return {
        "width": width,
        "height": height,
        "version": version,
        "loop": loop,
        "frames": frames,
    }


def parse_gif(data: bytes) -> dict:
    """Structural census without LZW expansion: dimensions, frame
    count, interlace/local-table flags, extension census, byte extent
    (m01 metadata surface)."""
    if data[:6] not in (_MAGIC87, _MAGIC89):
        raise ValueError("not a GIF: bad signature")
    width, height = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 7))
    n_frames = 0
    n_ext = 0
    n_interlaced = 0
    n_local_tables = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        pos += 1
        if b == 0x3B:
            return {
                "width": width,
                "height": height,
                "version": data[3:6].decode("ascii"),
                "n_frames": n_frames,
                "n_extensions": n_ext,
                "n_interlaced": n_interlaced,
                "n_local_tables": n_local_tables,
                "bytes_walked": pos,
            }
        if b == 0x21:
            pos += 1
            _, pos = _read_sub_blocks(data, pos)
            n_ext += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        if pos + 9 > n:
            raise EOFError("truncated GIF image descriptor")
        fpacked = data[pos + 8]
        pos += 9
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 7))
            n_local_tables += 1
        if fpacked & 0x40:
            n_interlaced += 1
        pos += 1  # min code size
        _, pos = _read_sub_blocks(data, pos)
        n_frames += 1
    raise EOFError("missing GIF trailer")

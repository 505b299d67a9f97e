"""sfnt table codecs: cmap format 4 and hmtx (OpenType spec).

The container layers (operators/woff2.py: WOFF2 with the glyf/loca
transform, WOFF 1.0, the sfnt checksum layer) move table BYTES; this
module decodes the two tables a crawl-side font census actually
queries — character coverage and advance widths:

* **cmap format 4** (the BMP segment-mapping subtable every TTF
  carries): writer + parser for the full container (version/encoding
  records) and the format-4 subtable — segments with endCode/
  startCode/idDelta/idRangeOffset, BOTH addressing lanes (idDelta
  arithmetic runs, and idRangeOffset glyphIdArray indirection for
  non-arithmetic runs — the pointer-arithmetic form where the offset
  is measured FROM the idRangeOffset slot itself), the 0xFFFF
  terminator segment, and the searchRange/entrySelector/rangeShift
  arithmetic validated on parse.
* **hmtx** with the short form: ``numberOfHMetrics`` (advanceWidth,
  lsb) pairs, then lsb-only entries that inherit the LAST advance —
  the compression real fonts use for monospace tails.

Structural violations raise ``ValueError``, truncation ``EOFError``
(the codec-family taxonomy).

100 TB shape: these run inside the same Arrow-batched ``mapInPandas``
walks as the container codecs — per-payload, no shuffle.
"""

from __future__ import annotations

import struct

__all__ = [
    "build_cmap4",
    "parse_cmap4",
    "build_hmtx",
    "parse_hmtx",
]


def build_cmap4(mapping: dict[int, int]) -> bytes:
    """Serialize a char→glyph mapping as a cmap table holding one
    format-4 subtable (platform 3 / encoding 1, the Windows BMP
    record every real TTF carries). Consecutive chars whose glyph ids
    advance in lockstep (gid = char + delta) become an idDelta
    segment; other runs go through glyphIdArray indirection."""
    if not mapping:
        raise ValueError("empty cmap mapping")
    chars = sorted(mapping)
    if chars[0] < 0 or chars[-1] > 0xFFFD:
        raise ValueError("cmap format 4 covers the BMP only")
    # split into runs of consecutive chars
    runs: list[list[int]] = [[chars[0]]]
    for c in chars[1:]:
        if c == runs[-1][-1] + 1:
            runs[-1].append(c)
        else:
            runs.append([c])
    segs: list[tuple[int, int, int, list[int] | None]] = []
    for run in runs:
        gids = [mapping[c] for c in run]
        deltas = {(g - c) & 0xFFFF for c, g in zip(run, gids)}
        if len(deltas) == 1:
            segs.append((run[0], run[-1], deltas.pop(), None))
        else:
            segs.append((run[0], run[-1], 0, gids))
    segs.append((0xFFFF, 0xFFFF, 1, None))  # terminator maps 0xFFFF->0
    seg_count = len(segs)
    glyph_id_array: list[int] = []
    end_codes, start_codes, id_deltas, id_range_offsets = [], [], [], []
    for i, (start, end, delta, gids) in enumerate(segs):
        end_codes.append(end)
        start_codes.append(start)
        id_deltas.append(delta)
        if gids is None:
            id_range_offsets.append(0)
        else:
            # offset in BYTES from THIS idRangeOffset slot to the
            # run's entries in glyphIdArray (the spec's in-place
            # pointer arithmetic): remaining slots + array position
            slots_after = seg_count - i
            id_range_offsets.append(
                2 * (slots_after + len(glyph_id_array))
            )
            glyph_id_array.extend(gids)
    es = (seg_count).bit_length() - 1
    search_range = 2 << es
    sub_len = 16 + 8 * seg_count + 2 * len(glyph_id_array)
    sub = struct.pack(
        ">HHHHHHH",
        4, sub_len, 0,  # format, length, language
        seg_count * 2, search_range, es, 2 * seg_count - search_range,
    )
    sub += struct.pack(">%dH" % seg_count, *end_codes)
    sub += b"\x00\x00"  # reservedPad
    sub += struct.pack(">%dH" % seg_count, *start_codes)
    sub += struct.pack(">%dH" % seg_count, *(d & 0xFFFF for d in id_deltas))
    sub += struct.pack(">%dH" % seg_count, *id_range_offsets)
    if glyph_id_array:
        sub += struct.pack(">%dH" % len(glyph_id_array), *glyph_id_array)
    # container: version 0, one encoding record (3,1) at offset 12
    return struct.pack(">HHHHI", 0, 1, 3, 1, 12) + sub


def parse_cmap4(data: bytes) -> dict:
    """Parse a cmap table, locate the (3,1) format-4 subtable, and
    recover the full char→glyph mapping. Returns ``{"mapping",
    "n_segments", "n_glyph_id_array", "search_ok"}``; the terminator
    segment is validated and excluded from ``n_segments``."""
    if len(data) < 4:
        raise EOFError("truncated cmap header")
    version, n_rec = struct.unpack(">HH", data[:4])
    if version != 0:
        raise ValueError(f"bad cmap version {version}")
    if len(data) < 4 + 8 * n_rec:
        raise EOFError("truncated cmap encoding records")
    sub_off = None
    for i in range(n_rec):
        pid, eid, off = struct.unpack(
            ">HHI", data[4 + 8 * i : 12 + 8 * i]
        )
        if (pid, eid) == (3, 1):
            sub_off = off
    if sub_off is None:
        raise ValueError("no (3,1) encoding record in cmap")
    if sub_off + 14 > len(data):
        raise EOFError("truncated cmap subtable header")
    fmt, sub_len, _lang, seg_x2, search_range, es, range_shift = (
        struct.unpack(">HHHHHHH", data[sub_off : sub_off + 14])
    )
    if fmt != 4:
        raise ValueError(f"cmap subtable format {fmt}, want 4")
    if seg_x2 % 2:
        raise ValueError("odd segCountX2")
    seg_count = seg_x2 // 2
    if seg_count == 0:
        raise ValueError("cmap format 4 with zero segments")
    want_es = seg_count.bit_length() - 1
    search_ok = (
        search_range == 2 << want_es
        and es == want_es
        and range_shift == seg_x2 - search_range
    )
    if sub_off + sub_len > len(data):
        raise EOFError("truncated cmap format 4 subtable")
    pos = sub_off + 14
    need = 8 * seg_count + 2
    if pos + need > sub_off + sub_len:
        raise EOFError("truncated cmap segment arrays")
    end_codes = struct.unpack(">%dH" % seg_count, data[pos : pos + seg_x2])
    pos += seg_x2
    if data[pos : pos + 2] != b"\x00\x00":
        raise ValueError("cmap reservedPad not zero")
    pos += 2
    start_codes = struct.unpack(">%dH" % seg_count, data[pos : pos + seg_x2])
    pos += seg_x2
    id_deltas = struct.unpack(">%dh" % seg_count, data[pos : pos + seg_x2])
    pos += seg_x2
    iro_base = pos  # byte position of idRangeOffset[0]
    id_range_offsets = struct.unpack(
        ">%dH" % seg_count, data[pos : pos + seg_x2]
    )
    pos += seg_x2
    if end_codes[-1] != 0xFFFF or start_codes[-1] != 0xFFFF:
        raise ValueError("cmap format 4 missing 0xFFFF terminator")
    if list(end_codes) != sorted(end_codes):
        raise ValueError("cmap segments not sorted by endCode")
    mapping: dict[int, int] = {}
    for i in range(seg_count):
        start, end = start_codes[i], end_codes[i]
        if start > end:
            raise ValueError(f"cmap segment {i} start > end")
        if start == 0xFFFF:
            continue  # terminator
        for c in range(start, end + 1):
            if id_range_offsets[i] == 0:
                gid = (c + id_deltas[i]) & 0xFFFF
            else:
                # the offset points from THIS idRangeOffset slot
                slot = iro_base + 2 * i
                gpos = slot + id_range_offsets[i] + 2 * (c - start)
                if gpos + 2 > sub_off + sub_len:
                    raise ValueError(
                        f"cmap segment {i} glyphIdArray overrun"
                    )
                gid = struct.unpack(">H", data[gpos : gpos + 2])[0]
                if gid:
                    gid = (gid + id_deltas[i]) & 0xFFFF
            if gid:
                mapping[c] = gid
    n_gia = (sub_off + sub_len - pos) // 2
    return {
        "mapping": mapping,
        "n_segments": seg_count - 1,
        "n_glyph_id_array": n_gia,
        "search_ok": search_ok,
    }


def build_hmtx(
    advances: list[int], lsbs: list[int], n_hmetrics: int
) -> bytes:
    """Serialize hmtx: ``n_hmetrics`` (advance, lsb) pairs then
    lsb-only entries (their advance is the LAST pair's — the short
    form). ``advances`` must be constant from ``n_hmetrics-1`` on."""
    ng = len(advances)
    if len(lsbs) != ng or not 1 <= n_hmetrics <= ng:
        raise ValueError("bad hmtx shape")
    if any(a != advances[n_hmetrics - 1] for a in advances[n_hmetrics:]):
        raise ValueError(
            "short-form hmtx requires a constant advance tail"
        )
    out = bytearray()
    for g in range(n_hmetrics):
        out += struct.pack(">Hh", advances[g], lsbs[g])
    for g in range(n_hmetrics, ng):
        out += struct.pack(">h", lsbs[g])
    return bytes(out)


def parse_hmtx(data: bytes, n_hmetrics: int, num_glyphs: int) -> dict:
    """Decode hmtx given hhea.numberOfHMetrics and maxp.numGlyphs
    (the two fields that size it — hmtx is the one sfnt table with no
    self-describing length). Returns ``{"advances", "lsbs",
    "sum_advance", "n_short"}``."""
    if not 1 <= n_hmetrics <= num_glyphs:
        raise ValueError(
            f"numberOfHMetrics {n_hmetrics} vs numGlyphs {num_glyphs}"
        )
    want = 4 * n_hmetrics + 2 * (num_glyphs - n_hmetrics)
    if len(data) < want:
        raise EOFError(f"hmtx holds {len(data)} bytes, want {want}")
    if len(data) > want:
        raise ValueError(f"hmtx holds {len(data)} bytes, want {want}")
    advances: list[int] = []
    lsbs: list[int] = []
    pos = 0
    for _ in range(n_hmetrics):
        a, l = struct.unpack(">Hh", data[pos : pos + 4])
        advances.append(a)
        lsbs.append(l)
        pos += 4
    last = advances[-1]
    for _ in range(num_glyphs - n_hmetrics):
        (l,) = struct.unpack(">h", data[pos : pos + 2])
        advances.append(last)
        lsbs.append(l)
        pos += 2
    return {
        "advances": advances,
        "lsbs": lsbs,
        "sum_advance": sum(advances),
        "n_short": num_glyphs - n_hmetrics,
    }

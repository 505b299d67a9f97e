"""CFF (Compact Font Format) codec — the table 'OTTO'-flavor
OpenType fonts carry instead of glyf/loca (Adobe CFF spec / ISO
14496-22; PostScript charstring outlines).

Layers implemented:

* **INDEX** (``_build_index`` / ``_parse_index``): Card16 count,
  OffSize 1–4, the (count+1) 1-based offset array, data — the
  container every CFF section rides. The writer picks the smallest
  legal OffSize; the parser validates monotone offsets and exact
  extents.
* **DICT** (``build_dict`` / ``parse_dict``): all four integer
  operand encodings (b0 32..246 single-byte, 247..250/251..254
  two-byte biased pairs, 28 sixteen-bit, 29 thirty-two-bit), the
  nibble-BCD real encoding (30), single-byte operators and the
  12-escape two-byte form.
* **Type 2 charstrings** (``build_charstring`` /
  ``run_charstring``): a bounded interpreter for the outline subset
  the fixtures emit — width operand, hstem/vstem, rmoveto/
  hmoveto/vmoveto, rlineto, rrcurveto, endchar — tracking point
  counts, stem counts and the current position. Operators outside
  the subset raise ``ValueError`` (this is a census interpreter,
  not a rasterizer; the subset is the structural skeleton every
  real Type 2 outline uses).
* **Font assembly** (``build_cff`` / ``parse_cff``): header,
  Name/TopDict/String/GlobalSubr INDEXes, CharStrings INDEX
  (op 17), Private DICT (op 18, size+offset pair) — offsets
  resolved with the standard two-pass fix-point, parse re-walks
  everything and censuses per-glyph interpreter results.

Structural violations raise ``ValueError``; truncation raises
``EOFError`` (the codec-family taxonomy).

100 TB shape: per-payload decode inside the same Arrow-batched
``mapInPandas`` walks as the other font codecs — no shuffle.
"""

from __future__ import annotations

import struct

__all__ = [
    "build_dict",
    "parse_dict",
    "build_charstring",
    "run_charstring",
    "build_cff",
    "parse_cff",
]


# ---------------------------------------------------------------------------
# INDEX


def _min_offsize(max_offset: int) -> int:
    for sz in (1, 2, 3, 4):
        if max_offset < 1 << (8 * sz):
            return sz
    raise ValueError("INDEX too large")


def _build_index(items: list[bytes]) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    data = b"".join(items)
    off_size = _min_offsize(len(data) + 1)
    out = bytearray(struct.pack(">HB", len(items), off_size))
    pos = 1
    offsets = [pos]
    for it in items:
        pos += len(it)
        offsets.append(pos)
    for o in offsets:
        out += o.to_bytes(off_size, "big")
    out += data
    return bytes(out)


def _parse_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    if pos + 2 > len(data):
        raise EOFError("truncated INDEX count")
    (count,) = struct.unpack(">H", data[pos : pos + 2])
    pos += 2
    if count == 0:
        return [], pos
    if pos >= len(data):
        raise EOFError("truncated INDEX offSize")
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise ValueError(f"bad INDEX offSize {off_size}")
    need = (count + 1) * off_size
    if pos + need > len(data):
        raise EOFError("truncated INDEX offset array")
    offsets = [
        int.from_bytes(data[pos + i * off_size : pos + (i + 1) * off_size],
                       "big")
        for i in range(count + 1)
    ]
    pos += need
    if offsets[0] != 1:
        raise ValueError("INDEX offsets must start at 1")
    if any(a > b for a, b in zip(offsets, offsets[1:])):
        raise ValueError("INDEX offsets not monotone")
    base = pos - 1
    end = base + offsets[-1]
    if end > len(data):
        raise EOFError("truncated INDEX data")
    items = [
        data[base + offsets[i] : base + offsets[i + 1]]
        for i in range(count)
    ]
    return items, end


# ---------------------------------------------------------------------------
# DICT


def _encode_real(v: float) -> bytes:
    s = repr(v)
    nibbles = []
    for ch in s:
        if ch.isdigit():
            nibbles.append(int(ch))
        elif ch == ".":
            nibbles.append(0xA)
        elif ch == "-":
            nibbles.append(0xE)
        elif ch == "e":
            nibbles.append(0xB)  # E+ (an E- would need 0xC; repr uses e-)
        else:
            raise ValueError(f"unencodable real {v!r}")
    nibbles.append(0xF)
    if len(nibbles) % 2:
        nibbles.append(0xF)
    return bytes([0x1E]) + bytes(
        (nibbles[i] << 4) | nibbles[i + 1]
        for i in range(0, len(nibbles), 2)
    )


def build_dict(entries: list[tuple[int, list]]) -> bytes:
    """Serialize ``(operator, operands)`` pairs. Operators >= 0x0c00
    encode as the 12-escape two-byte form; each operand picks its
    smallest integer encoding (or the real encoding for floats)."""
    out = bytearray()
    for op, operands in entries:
        for v in operands:
            if isinstance(v, float) and not v.is_integer():
                out += _encode_real(v)
                continue
            v = int(v)
            if -107 <= v <= 107:
                out.append(v + 139)
            elif 108 <= v <= 1131:
                v -= 108
                out += bytes([247 + (v >> 8), v & 0xFF])
            elif -1131 <= v <= -108:
                v = -v - 108
                out += bytes([251 + (v >> 8), v & 0xFF])
            elif -32768 <= v <= 32767:
                out += struct.pack(">Bh", 28, v)
            else:
                out += struct.pack(">Bi", 29, v)
        if op >= 0x0C00:
            out += bytes([12, op & 0xFF])
        elif 0 <= op <= 21 and op != 12:
            out.append(op)
        else:
            raise ValueError(f"bad DICT operator {op}")
    return bytes(out)


def parse_dict(data: bytes) -> dict[int, list]:
    """Parse a DICT → {operator: operands}; 12-escape operators key as
    ``0x0c00 | op2``."""
    out: dict[int, list] = {}
    operands: list = []
    pos = 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 12:
            if pos + 1 >= len(data):
                raise EOFError("truncated escape operator")
            out[0x0C00 | data[pos + 1]] = operands
            operands = []
            pos += 2
        elif b0 <= 21:
            out[b0] = operands
            operands = []
            pos += 1
        elif b0 == 28:
            if pos + 3 > len(data):
                raise EOFError("truncated 16-bit operand")
            operands.append(struct.unpack(">h", data[pos + 1 : pos + 3])[0])
            pos += 3
        elif b0 == 29:
            if pos + 5 > len(data):
                raise EOFError("truncated 32-bit operand")
            operands.append(struct.unpack(">i", data[pos + 1 : pos + 5])[0])
            pos += 5
        elif b0 == 30:
            s = ""
            pos += 1
            done = False
            while not done:
                if pos >= len(data):
                    raise EOFError("truncated real operand")
                byte = data[pos]
                pos += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "e"
                    elif nib == 0xC:
                        s += "e-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                    else:
                        raise ValueError(f"reserved real nibble {nib:#x}")
            operands.append(float(s) if s else 0.0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            pos += 1
        elif 247 <= b0 <= 250:
            if pos + 1 >= len(data):
                raise EOFError("truncated 2-byte operand")
            operands.append((b0 - 247) * 256 + data[pos + 1] + 108)
            pos += 2
        elif 251 <= b0 <= 254:
            if pos + 1 >= len(data):
                raise EOFError("truncated 2-byte operand")
            operands.append(-(b0 - 251) * 256 - data[pos + 1] - 108)
            pos += 2
        else:
            raise ValueError(f"reserved DICT byte {b0:#x}")
    if operands:
        raise ValueError("DICT ends with dangling operands")
    return out


# ---------------------------------------------------------------------------
# Type 2 charstrings (bounded outline subset)

_T2_OPS = {1: "hstem", 3: "vstem", 4: "vmoveto", 5: "rlineto",
            8: "rrcurveto", 14: "endchar", 21: "rmoveto", 22: "hmoveto"}


def _t2_number(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 0xFF])
    if -32768 <= v <= 32767:
        return struct.pack(">Bh", 28, v)
    raise ValueError("charstring number out of 16-bit range")


def build_charstring(
    ops: list[tuple[str, list[int]]], *, width: int | None = None
) -> bytes:
    """Serialize ``(opname, args)`` pairs; ``width`` (the optional
    leading width delta) prefixes the first operator's operands."""
    rev = {v: k for k, v in _T2_OPS.items()}
    out = bytearray()
    first = True
    for name, args in ops:
        if name not in rev:
            raise ValueError(f"unsupported Type 2 op {name!r}")
        if first and width is not None:
            out += _t2_number(width)
        first = False
        for a in args:
            out += _t2_number(a)
        out.append(rev[name])
    return bytes(out)


def run_charstring(data: bytes, *, nominal_width: int = 0) -> dict:
    """Interpret the bounded Type 2 subset: returns ``{"n_ops",
    "n_points", "n_stems", "width", "x", "y"}``. A width operand is
    detected by operand-count parity on the first stem/move/endchar
    (the spec's rule); operators outside the subset raise."""
    stack: list[int] = []
    pos = 0
    st = {"n_ops": 0, "n_points": 0, "n_stems": 0,
          "width": None, "x": 0, "y": 0}
    seen_first = False
    ended = False
    while pos < len(data):
        if ended:
            raise ValueError("bytes after endchar")
        b0 = data[pos]
        if b0 >= 32 or b0 == 28:
            if b0 == 28:
                if pos + 3 > len(data):
                    raise EOFError("truncated charstring number")
                stack.append(struct.unpack(">h", data[pos + 1 : pos + 3])[0])
                pos += 3
            elif b0 <= 246:
                stack.append(b0 - 139)
                pos += 1
            elif b0 <= 250:
                if pos + 1 >= len(data):
                    raise EOFError("truncated charstring number")
                stack.append((b0 - 247) * 256 + data[pos + 1] + 108)
                pos += 2
            elif b0 <= 254:
                if pos + 1 >= len(data):
                    raise EOFError("truncated charstring number")
                stack.append(-(b0 - 251) * 256 - data[pos + 1] - 108)
                pos += 2
            else:  # 255: 16.16 fixed
                if pos + 5 > len(data):
                    raise EOFError("truncated charstring number")
                stack.append(
                    struct.unpack(">i", data[pos + 1 : pos + 5])[0] / 65536
                )
                pos += 5
            continue
        name = _T2_OPS.get(b0)
        if name is None:
            raise ValueError(f"Type 2 operator {b0} outside the subset")
        pos += 1
        st["n_ops"] += 1
        if name in ("hstem", "vstem"):
            if not seen_first and len(stack) % 2 == 1:
                st["width"] = nominal_width + stack.pop(0)
            seen_first = True
            if len(stack) % 2 or not stack:
                raise ValueError(f"{name}: odd stem operands")
            st["n_stems"] += len(stack) // 2
        elif name in ("rmoveto", "hmoveto", "vmoveto"):
            want = 2 if name == "rmoveto" else 1
            if not seen_first and len(stack) == want + 1:
                st["width"] = nominal_width + stack.pop(0)
            seen_first = True
            if len(stack) != want:
                raise ValueError(f"{name}: bad operand count")
            if name == "rmoveto":
                st["x"] += stack[0]
                st["y"] += stack[1]
            elif name == "hmoveto":
                st["x"] += stack[0]
            else:
                st["y"] += stack[0]
            st["n_points"] += 1
        elif name == "rlineto":
            if not stack or len(stack) % 2:
                raise ValueError("rlineto: bad operand count")
            for i in range(0, len(stack), 2):
                st["x"] += stack[i]
                st["y"] += stack[i + 1]
                st["n_points"] += 1
        elif name == "rrcurveto":
            if not stack or len(stack) % 6:
                raise ValueError("rrcurveto: bad operand count")
            for i in range(0, len(stack), 6):
                st["x"] += stack[i] + stack[i + 2] + stack[i + 4]
                st["y"] += stack[i + 1] + stack[i + 3] + stack[i + 5]
                st["n_points"] += 3
        elif name == "endchar":
            if not seen_first and len(stack) == 1:
                st["width"] = nominal_width + stack.pop(0)
            seen_first = True
            if stack:
                raise ValueError("endchar: dangling operands")
            ended = True
        stack = []
    if not ended:
        raise ValueError("charstring missing endchar")
    return st


# ---------------------------------------------------------------------------
# font assembly


def build_cff(
    name: str,
    charstrings: list[bytes],
    *,
    private_entries: list[tuple[int, list]] | None = None,
    top_extra: list[tuple[int, list]] | None = None,
) -> bytes:
    """Assemble a CFF font: header, Name INDEX, Top DICT INDEX
    (CharStrings op 17 + Private op 18 + extras), empty String and
    GlobalSubr INDEXes, CharStrings INDEX, Private DICT. The Top
    DICT's offsets are resolved by fix-point iteration (their own
    encoded size changes the offsets they encode)."""
    header = bytes([1, 0, 4, 4])  # major, minor, hdrSize, offSize
    name_idx = _build_index([name.encode("latin-1")])
    string_idx = _build_index([])
    gsubr_idx = _build_index([])
    cs_idx = _build_index(charstrings)
    private = build_dict(private_entries or [(20, [0]), (21, [0])])
    cs_off = 0
    priv_off = 0
    for _ in range(8):  # fix-point: offsets depend on dict size
        top = build_dict(
            (top_extra or [])
            + [(17, [cs_off]), (18, [len(private), priv_off])]
        )
        top_idx = _build_index([top])
        base = (
            len(header) + len(name_idx) + len(top_idx)
            + len(string_idx) + len(gsubr_idx)
        )
        new_cs, new_priv = base, base + len(cs_idx)
        if (new_cs, new_priv) == (cs_off, priv_off):
            break
        cs_off, priv_off = new_cs, new_priv
    else:
        raise ValueError("CFF offset fix-point did not converge")
    return (
        header + name_idx + top_idx + string_idx + gsubr_idx
        + cs_idx + private
    )


def parse_cff(data: bytes) -> dict:
    """Walk a CFF font: header, the four leading INDEXes, the Top
    DICT's CharStrings and Private pointers, the CharStrings INDEX,
    the Private DICT — then run every charstring through the bounded
    interpreter. Returns the census."""
    if len(data) < 4:
        raise EOFError("truncated CFF header")
    major, minor, hdr_size, _off_size = data[:4]
    if major != 1:
        raise ValueError(f"unsupported CFF major version {major}")
    if hdr_size < 4:
        raise ValueError(f"bad CFF hdrSize {hdr_size}")
    pos = hdr_size
    names, pos = _parse_index(data, pos)
    if len(names) != 1:
        raise ValueError(f"CFF Name INDEX holds {len(names)} entries")
    tops, pos = _parse_index(data, pos)
    if len(tops) != 1:
        raise ValueError("CFF Top DICT INDEX must hold one entry")
    top = parse_dict(tops[0])
    strings, pos = _parse_index(data, pos)
    gsubrs, pos = _parse_index(data, pos)
    if 17 not in top:
        raise ValueError("Top DICT missing CharStrings (op 17)")
    cs_off = int(top[17][0])
    charstrings, cs_end = _parse_index(data, cs_off)
    priv_size = priv_off = 0
    private: dict[int, list] = {}
    if 18 in top:
        priv_size, priv_off = (int(v) for v in top[18])
        if priv_off + priv_size > len(data):
            raise EOFError("truncated Private DICT")
        private = parse_dict(data[priv_off : priv_off + priv_size])
    nominal = int(private.get(21, [0])[0]) if private else 0
    default_w = int(private.get(20, [0])[0]) if private else 0
    glyphs = []
    for cs in charstrings:
        st = run_charstring(cs, nominal_width=nominal)
        if st["width"] is None:
            st["width"] = default_w
        glyphs.append(st)
    return {
        "name": names[0].decode("latin-1"),
        "n_glyphs": len(charstrings),
        "n_strings": len(strings),
        "n_gsubrs": len(gsubrs),
        "top_dict": top,
        "private_dict": private,
        "glyphs": glyphs,
        "n_points": sum(g["n_points"] for g in glyphs),
        "n_stems": sum(g["n_stems"] for g in glyphs),
        "sum_width": sum(g["width"] for g in glyphs),
        "charstring_bytes": sum(len(c) for c in charstrings),
    }

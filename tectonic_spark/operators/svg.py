"""SVG census — the vector-graphics format of the web (icons, logos,
charts); after raster images and fonts it is the web asset a crawl
meets most.  XML layer rides xmlparse.py; the substance here is the
SVG 1.1/2.0 **path data grammar** (the ``d`` attribute), a real
micro-language with its own tokenizer rules:

* commands ``M L H V C S Q T A Z`` in absolute and relative form;
* implicit command repetition (``L 1 2 3 4`` draws two segments —
  and an implicit repeat after ``M`` is ``L``, per spec);
* number tokenization where separators are optional when
  unambiguous: ``M.5.5`` is two numbers, ``1-2`` is ``1`` then
  ``-2``, flags in ``A`` are single characters;
* subpath accounting (``M``/``Z``), current-point tracking through
  every command (including ``H``/``V`` one-axis moves and the
  reflected control points of ``S``/``T``).

``parse_path`` → per-command census + exact current-point tracking
(integer arithmetic for integer inputs, so endpoints are exact);
``census_svg`` walks the element tree (rect/circle/ellipse/line/
polyline/polygon/path/g) and aggregates.

Error taxonomy: ``ValueError`` structural (unknown command, bad
number, path not starting with moveto, wrong arc flags),
``EOFError`` truncation via the XML layer.

Reference framing: beyond-reference crawl-analysis surface; same
evidence class as structured_data.py.
"""

from __future__ import annotations

import re

from tectonic_spark.operators.ooxml import _attr, _resolve
from tectonic_spark.operators.xmlparse import parse_xml

__all__ = ["build_svg", "census_svg", "parse_path"]

SVG_NS = "http://www.w3.org/2000/svg"

_NUM = re.compile(
    r"[ \t\r\n,]*([+-]?(?:[0-9]*\.[0-9]+|[0-9]+\.?)(?:[eE][+-]?[0-9]+)?)"
)
_FLAG = re.compile(r"[ \t\r\n,]*([01])")
_CMD = re.compile(r"[ \t\r\n,]*([MmLlHhVvCcSsQqTtAaZz])")

# params per command (Z handled separately); A's two flags are
# tokenized with the single-character flag rule
_ARITY = {
    "M": 2, "L": 2, "H": 1, "V": 1, "C": 6, "S": 4, "Q": 4, "T": 2, "A": 7,
}


def _num(s: str, pos: int, what: str) -> tuple[float, int]:
    m = _NUM.match(s, pos)
    if not m:
        raise ValueError(f"svg path: expected number at offset {pos} ({what})")
    text = m.group(1)
    val = float(text)
    if val == int(val) and "e" not in text and "E" not in text:
        val = int(val)
    return val, m.end()


def parse_path(d: str) -> dict:
    """Parse SVG path data → census dict: ``n_commands`` (explicit +
    implicit), ``n_subpaths``, ``per_cmd`` (counts by canonical
    uppercase letter), ``endpoint`` (exact current point after the
    last command), ``n_implicit`` (commands supplied by repetition)."""
    pos = 0
    n = len(d)
    per_cmd: dict[str, int] = {}
    n_commands = 0
    n_implicit = 0
    n_subpaths = 0
    cx = cy = 0
    sx = sy = 0  # subpath start (for Z)
    started = False
    cmd = None

    while True:
        m = _CMD.match(d, pos)
        implicit = False
        if m:
            cmd = m.group(1)
            pos = m.end()
        else:
            # not a command letter: implicit repetition of the previous
            # command — if any numbers remain
            probe = _NUM.match(d, pos)
            if not probe:
                break  # only trailing whitespace left (or end)
            if cmd is None:
                raise ValueError("svg path: data before any command")
            if cmd in "Mm":
                cmd = "L" if cmd == "M" else "l"  # spec: implicit lineto
            if cmd in "Zz":
                raise ValueError("svg path: coordinates after Z without a command")
            implicit = True
        letter = cmd.upper()
        if not started and letter != "M":
            raise ValueError("svg path: must start with a moveto")
        if letter == "Z":
            cx, cy = sx, sy
            n_commands += 1
            per_cmd["Z"] = per_cmd.get("Z", 0) + 1
            continue
        rel = cmd.islower()
        args: list[float] = []
        if letter == "A":
            for i in range(7):
                if i in (3, 4):
                    fm = _FLAG.match(d, pos)
                    if not fm:
                        raise ValueError(
                            f"svg path: arc flag expected at offset {pos}"
                        )
                    args.append(int(fm.group(1)))
                    pos = fm.end()
                else:
                    v, pos = _num(d, pos, f"A arg {i}")
                    args.append(v)
        else:
            for i in range(_ARITY[letter]):
                v, pos = _num(d, pos, f"{letter} arg {i}")
                args.append(v)
        # current-point tracking
        if letter == "M":
            cx, cy = (cx + args[0], cy + args[1]) if rel else (args[0], args[1])
            sx, sy = cx, cy
            n_subpaths += 1
            started = True
        elif letter == "L" or letter == "T":
            cx, cy = (cx + args[0], cy + args[1]) if rel else (args[0], args[1])
        elif letter == "H":
            cx = cx + args[0] if rel else args[0]
        elif letter == "V":
            cy = cy + args[0] if rel else args[0]
        elif letter == "C":
            cx, cy = (cx + args[4], cy + args[5]) if rel else (args[4], args[5])
        elif letter in ("S", "Q"):
            cx, cy = (cx + args[2], cy + args[3]) if rel else (args[2], args[3])
        elif letter == "A":
            cx, cy = (cx + args[5], cy + args[6]) if rel else (args[5], args[6])
        n_commands += 1
        n_implicit += 1 if implicit else 0
        per_cmd[letter] = per_cmd.get(letter, 0) + 1
    if pos < n and d[pos:].strip():
        raise ValueError(
            f"svg path: trailing junk {d[pos:][:20]!r} at offset {pos}"
        )
    return {
        "n_commands": n_commands,
        "n_subpaths": n_subpaths,
        "per_cmd": per_cmd,
        "endpoint": (cx, cy),
        "n_implicit": n_implicit,
    }


# ------------------------------------------------------------------ writer


def build_svg(
    *,
    width: int,
    height: int,
    rects: list[tuple[int, int, int, int]] = (),
    circles: list[tuple[int, int, int]] = (),
    paths: list[str] = (),
    grouped: bool = False,
) -> bytes:
    body = []
    shapes = []
    for x, y, w, h in rects:
        shapes.append(
            f'<rect x="{x}" y="{y}" width="{w}" height="{h}"/>'
        )
    for cx, cy, r in circles:
        shapes.append(f'<circle cx="{cx}" cy="{cy}" r="{r}"/>')
    for dd in paths:
        shapes.append(f'<path d="{dd}"/>')
    if grouped:
        body.append("<g>" + "".join(shapes) + "</g>")
    else:
        body.extend(shapes)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<svg xmlns="{SVG_NS}" width="{width}" height="{height}"'
        f' viewBox="0 0 {width} {height}">' + "".join(body) + "</svg>"
    ).encode()


# ------------------------------------------------------------------ census


def census_svg(data: bytes) -> dict:
    """Walk an SVG document → shape/path census with the viewBox
    verified against width/height."""
    root = parse_xml(data)
    u, l, scope = _resolve(root, {})
    if (u, l) != (SVG_NS, "svg"):
        raise ValueError("not an SVG document")
    w = _attr(root, scope, "", "width")
    h = _attr(root, scope, "", "height")
    vb = _attr(root, scope, "", "viewBox")
    if w is None or h is None:
        raise ValueError("svg: missing width/height")
    width, height = int(w), int(h)
    if vb is not None:
        parts = vb.replace(",", " ").split()
        if len(parts) != 4:
            raise ValueError(f"svg: malformed viewBox {vb!r}")
        if [int(float(p)) for p in parts] != [0, 0, width, height]:
            raise ValueError(
                f"svg: viewBox {vb!r} disagrees with {width}x{height}"
            )
    counts = {"rect": 0, "circle": 0, "ellipse": 0, "line": 0,
              "polyline": 0, "polygon": 0, "path": 0, "g": 0}
    path_commands = 0
    path_subpaths = 0
    path_implicit = 0
    endpoints: list[tuple] = []

    def walk(el, scope) -> None:
        nonlocal path_commands, path_subpaths, path_implicit
        for c in el.children:
            cu, cl, cscope = _resolve(c, scope)
            if cu != SVG_NS:
                continue
            if cl in counts:
                counts[cl] += 1
            if cl == "path":
                dd = _attr(c, cscope, "", "d")
                if dd is None:
                    raise ValueError("svg: path without d")
                info = parse_path(dd)
                path_commands += info["n_commands"]
                path_subpaths += info["n_subpaths"]
                path_implicit += info["n_implicit"]
                endpoints.append(info["endpoint"])
            if cl == "g":
                walk(c, cscope)

    walk(root, scope)
    return {
        "width": width,
        "height": height,
        "counts": counts,
        "path_commands": path_commands,
        "path_subpaths": path_subpaths,
        "path_implicit": path_implicit,
        "endpoints": endpoints,
    }

"""OpenDocument Text (.odt) codec — the OASIS ODF 1.2 format
(LibreOffice/OpenOffice default), the third member of the office trio
next to OOXML (ooxml.py) and RTF (rtf.py); government and academic
corpora are full of it.

An .odt is a ZIP whose first member must be the ``mimetype`` stored
uncompressed (ODF 1.2 Part 3 §3.3 — the same magic-sniffing rule as
EPUB's OCF), with ``META-INF/manifest.xml`` listing every part and
``content.xml`` carrying the document body in the ODF namespaces.

* **Writer** (``build_odt``): mimetype-first packaging, manifest,
  ``content.xml`` (``office:document-content`` → ``office:body`` →
  ``office:text`` with ``text:h``/``text:p`` paragraphs, ``text:span``
  runs, ``text:tab`` / ``text:line-break``), ``meta.xml`` with
  ``dc:title``.  The ODF whitespace rule is implemented for real:
  consecutive spaces are encoded as one literal space plus
  ``<text:s text:c="n"/>`` (ODF collapses literal runs), and leading
  spaces likewise ride ``text:s``.
* **Extractor** (``extract_odt``): verifies the mimetype rule, checks
  every package part against the manifest, resolves the ODF
  namespaces by URI, walks paragraphs/headings in order, expands
  ``text:s``/``text:tab``/``text:line-break``, and reads the title
  out of ``meta.xml``.

Error taxonomy: ``EOFError`` truncation (ZIP layer), ``ValueError``
structural (mimetype violations, manifest mismatches, wrong
namespaces).

Reference framing: beyond-reference crawl-ingestion surface, same
evidence class as ooxml.py / epub.py / rtf.py.
"""

from __future__ import annotations

from tectonic_spark.operators.archive import build_zip, parse_zip
from tectonic_spark.operators.ooxml import _attr, _resolve
from tectonic_spark.operators.xmlparse import Element, parse_xml

__all__ = ["build_odt", "extract_odt"]

MIMETYPE = b"application/vnd.oasis.opendocument.text"
OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
MANIFEST_NS = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"
META_NS = "urn:oasis:names:tc:opendocument:xmlns:meta:1.0"
DC_NS = "http://purl.org/dc/elements/1.1/"


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


# ------------------------------------------------------------------ writer


def _encode_ws(piece: str) -> str:
    """Escape a text piece per the ODF whitespace rule: any run of 2+
    spaces becomes one literal space + ``<text:s text:c="n-1"/>``; a
    LEADING space becomes ``<text:s/>`` outright."""
    out: list[str] = []
    i = 0
    n = len(piece)
    while i < n:
        if piece[i] == " ":
            j = i
            while j < n and piece[j] == " ":
                j += 1
            run = j - i
            if i == 0:
                out.append(
                    f'<text:s text:c="{run}"/>' if run > 1 else "<text:s/>"
                )
            elif run > 1:
                out.append(" ")
                out.append(
                    f'<text:s text:c="{run - 1}"/>'
                    if run > 2
                    else "<text:s/>"
                )
            else:
                out.append(" ")
            i = j
        else:
            j = i
            while j < n and piece[j] != " ":
                j += 1
            out.append(_esc(piece[i:j]))
            i = j
    return "".join(out)


def _para_xml(text: str) -> str:
    """Paragraph body: TAB → text:tab, NL → text:line-break, spaces per
    the whitespace rule, split into two text:span runs."""
    words = text.split(" ")
    mid = (len(words) + 1) // 2
    chunks = [" ".join(words[:mid]), " ".join(words[mid:])]
    spans = []
    for i, chunk in enumerate(chunks):
        if not chunk and i > 0:
            continue
        # the separator space between the two runs belongs to run 0 —
        # and it exists whenever words continue past the split point,
        # even if the remainder joins to "" (a trailing-space word)
        if i == 0 and len(words) > mid:
            chunk += " "
        parts = []
        for j, seg in enumerate(chunk.split("\t")):
            if j:
                parts.append("<text:tab/>")
            for k, piece in enumerate(seg.split("\n")):
                if k:
                    parts.append("<text:line-break/>")
                if piece:
                    parts.append(_encode_ws(piece))
        spans.append(f"<text:span>{''.join(parts)}</text:span>")
    return "".join(spans)


def build_odt(
    paragraphs: list[tuple[int, str]],
    *,
    title: str,
) -> bytes:
    """Serialize an .odt.  ``paragraphs`` are ``(outline_level, text)``
    — level 0 is a body paragraph (``text:p``), level ≥ 1 a heading
    (``text:h text:outline-level``)."""
    body = []
    for level, text in paragraphs:
        inner = _para_xml(text)
        if level > 0:
            body.append(
                f'<text:h text:outline-level="{level}">{inner}</text:h>'
            )
        else:
            body.append(f"<text:p>{inner}</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{OFFICE_NS}"'
        f' xmlns:text="{TEXT_NS}" office:version="1.2">'
        "<office:body><office:text>"
        + "".join(body)
        + "</office:text></office:body></office:document-content>"
    ).encode()
    meta = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-meta xmlns:office="{OFFICE_NS}"'
        f' xmlns:meta="{META_NS}" xmlns:dc="{DC_NS}"'
        ' office:version="1.2"><office:meta>'
        f"<dc:title>{_esc(title)}</dc:title>"
        "</office:meta></office:document-meta>"
    ).encode()
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<manifest:manifest xmlns:manifest="{MANIFEST_NS}"'
        ' manifest:version="1.2">'
        '<manifest:file-entry manifest:full-path="/"'
        f' manifest:media-type="{MIMETYPE.decode()}"/>'
        '<manifest:file-entry manifest:full-path="content.xml"'
        ' manifest:media-type="text/xml"/>'
        '<manifest:file-entry manifest:full-path="meta.xml"'
        ' manifest:media-type="text/xml"/>'
        "</manifest:manifest>"
    ).encode()
    return build_zip(
        [
            ("mimetype", MIMETYPE, "stored"),
            ("META-INF/manifest.xml", manifest, "deflate"),
            ("content.xml", content, "deflate"),
            ("meta.xml", meta, "deflate"),
        ]
    )


# --------------------------------------------------------------- extractor


def extract_odt(data: bytes) -> dict:
    """Parse an .odt → ``{paragraphs: [(level, text)], title,
    n_spans}``, enforcing the mimetype-first rule and the manifest."""
    members = parse_zip(data)
    if not members or members[0]["name"] != "mimetype":
        raise ValueError("odt: first member must be 'mimetype' (ODF 1.2)")
    if members[0]["method"] != 0:
        raise ValueError("odt: mimetype member must be stored")
    if members[0]["data"] != MIMETYPE:
        raise ValueError("odt: wrong mimetype payload")
    by_name = {m["name"]: m["data"] for m in members}

    if "META-INF/manifest.xml" not in by_name:
        raise ValueError("odt: missing META-INF/manifest.xml")
    listed = _manifest_paths(by_name["META-INF/manifest.xml"])
    for name in by_name:
        if name in ("mimetype", "META-INF/manifest.xml"):
            continue
        if name not in listed:
            raise ValueError(f"odt: part {name!r} not in the manifest")
    if "content.xml" not in by_name:
        raise ValueError("odt: missing content.xml")

    root = parse_xml(by_name["content.xml"], preserve_space=True)
    u, l, scope = _resolve(root, {})
    if (u, l) != (OFFICE_NS, "document-content"):
        raise ValueError("odt: root is not office:document-content")
    paragraphs: list[tuple[int, str]] = []
    n_spans = 0
    for body in _kids(root, scope, OFFICE_NS, "body"):
        for otext in _kids(body[0], body[1], OFFICE_NS, "text"):
            for c in otext[0].children:
                cu, cl, cscope = _resolve(c, otext[1])
                if cu != TEXT_NS:
                    continue
                if cl == "p":
                    t, ns = _para_text(c, cscope)
                    paragraphs.append((0, t))
                    n_spans += ns
                elif cl == "h":
                    lvl = _attr(c, cscope, TEXT_NS, "outline-level")
                    t, ns = _para_text(c, cscope)
                    paragraphs.append((int(lvl or 1), t))
                    n_spans += ns
                else:
                    raise ValueError(f"odt: unexpected text child {cl}")

    title = None
    if "meta.xml" in by_name:
        mroot = parse_xml(by_name["meta.xml"])
        mu, ml, mscope = _resolve(mroot, {})
        if (mu, ml) != (OFFICE_NS, "document-meta"):
            raise ValueError("odt: malformed meta.xml")
        for om in _kids(mroot, mscope, OFFICE_NS, "meta"):
            for c in om[0].children:
                cu, cl, _ = _resolve(c, om[1])
                if (cu, cl) == (DC_NS, "title"):
                    title = c.text
    return {"paragraphs": paragraphs, "title": title, "n_spans": n_spans}


def _manifest_paths(data: bytes) -> set[str]:
    root = parse_xml(data)
    u, l, scope = _resolve(root, {})
    if (u, l) != (MANIFEST_NS, "manifest"):
        raise ValueError("odt: malformed manifest")
    out: set[str] = set()
    for c in root.children:
        cu, cl, cscope = _resolve(c, scope)
        if (cu, cl) != (MANIFEST_NS, "file-entry"):
            continue
        path = _attr(c, cscope, MANIFEST_NS, "full-path")
        if path is None:
            raise ValueError("odt: file-entry without full-path")
        out.add(path)
    return out


def _kids(el, scope, uri, local):
    out = []
    for c in el.children:
        cu, cl, cscope = _resolve(c, scope)
        if (cu, cl) == (uri, local):
            out.append((c, cscope))
    return out


def _para_text(el: Element, scope: dict) -> tuple[str, int]:
    n_spans = 0
    pieces: list[str] = []
    for c in el.children:
        cu, cl, cscope = _resolve(c, scope)
        if (cu, cl) != (TEXT_NS, "span"):
            raise ValueError(f"odt: unexpected paragraph child {cl}")
        n_spans += 1
        pieces.append(_span_text(c, cscope))
    return "".join(pieces), n_spans


def _span_text(span: Element, scope: dict) -> str:
    """Expand a text:span via the parser's mixed-content view (character
    data and expansion elements in DOCUMENT order — the ordering .text
    + .children cannot express)."""
    out: list[str] = []
    for item in span.content:
        if isinstance(item, str):
            out.append(item)
            continue
        iu, il, iscope = _resolve(item, scope)
        if iu != TEXT_NS:
            raise ValueError(f"odt: unexpected span child {item.tag}")
        if il == "s":
            c = _attr(item, iscope, TEXT_NS, "c")
            out.append(" " * (int(c) if c is not None else 1))
        elif il == "tab":
            out.append("\t")
        elif il == "line-break":
            out.append("\n")
        else:
            raise ValueError(f"odt: unexpected span child text:{il}")
    return "".join(out)


# ------------------------------------------------------------ ODS layer
# OpenDocument Spreadsheet — the ODF tabular sibling (the xlsx/ooxml
# relationship mirrored): office:spreadsheet → table:table →
# table:table-row → table:table-cell, typed values via
# office:value-type / office:value, strings as text:p children, and
# the ODF storage quirk that matters at parse time:
# ``table:number-columns-repeated`` compresses runs of identical
# cells (LibreOffice emits it for any repetition, including the
# trailing-empty fill real sheets always have).

TABLE_NS = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
ODS_MIMETYPE = b"application/vnd.oasis.opendocument.spreadsheet"


def build_ods(
    sheets: list[tuple[str, list[list]]],
    *,
    repeat_compress: bool = True,
) -> bytes:
    """Serialize an .ods.  Cells are int/float/str.  With
    ``repeat_compress`` (the LibreOffice-faithful default), horizontal
    runs of identical cells are stored ONCE with
    ``table:number-columns-repeated``."""
    body = []
    for name, rows in sheets:
        body.append(f'<table:table table:name="{_esc(name)}">')
        for row in rows:
            body.append("<table:table-row>")
            c = 0
            while c < len(row):
                v = row[c]
                run = 1
                if repeat_compress:
                    while c + run < len(row) and row[c + run] == v and (
                        type(row[c + run]) is type(v)
                    ):
                        run += 1
                rep = (
                    f' table:number-columns-repeated="{run}"'
                    if run > 1
                    else ""
                )
                if isinstance(v, str):
                    body.append(
                        f'<table:table-cell{rep} office:value-type='
                        f'"string"><text:p>{_esc(v)}</text:p>'
                        "</table:table-cell>"
                    )
                else:
                    body.append(
                        f'<table:table-cell{rep} office:value-type='
                        f'"float" office:value="{v!r}"/>'
                    )
                c += run
            body.append("</table:table-row>")
        body.append("</table:table>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{OFFICE_NS}"'
        f' xmlns:table="{TABLE_NS}" xmlns:text="{TEXT_NS}"'
        ' office:version="1.2">'
        "<office:body><office:spreadsheet>"
        + "".join(body)
        + "</office:spreadsheet></office:body></office:document-content>"
    ).encode()
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<manifest:manifest xmlns:manifest="{MANIFEST_NS}"'
        ' manifest:version="1.2">'
        '<manifest:file-entry manifest:full-path="/"'
        f' manifest:media-type="{ODS_MIMETYPE.decode()}"/>'
        '<manifest:file-entry manifest:full-path="content.xml"'
        ' manifest:media-type="text/xml"/>'
        "</manifest:manifest>"
    ).encode()
    return build_zip(
        [
            ("mimetype", ODS_MIMETYPE, "stored"),
            ("META-INF/manifest.xml", manifest, "deflate"),
            ("content.xml", content, "deflate"),
        ]
    )


def extract_ods(data: bytes) -> dict:
    """Parse an .ods → ``{sheets: [(name, rows)], n_repeated_cells}``
    with repeated-cell runs expanded and typed values recovered;
    ``n_repeated_cells`` counts cells that arrived compressed (the
    audit that the expansion actually ran)."""
    members = parse_zip(data)
    if not members or members[0]["name"] != "mimetype":
        raise ValueError("ods: first member must be 'mimetype' (ODF 1.2)")
    if members[0]["method"] != 0:
        raise ValueError("ods: mimetype member must be stored")
    if members[0]["data"] != ODS_MIMETYPE:
        raise ValueError("ods: wrong mimetype payload")
    by_name = {m["name"]: m["data"] for m in members}
    if "content.xml" not in by_name:
        raise ValueError("ods: missing content.xml")
    root = parse_xml(by_name["content.xml"], preserve_space=True)
    u, l, scope = _resolve(root, {})
    if (u, l) != (OFFICE_NS, "document-content"):
        raise ValueError("ods: root is not office:document-content")
    sheets: list[tuple[str, list[list]]] = []
    n_repeated = 0
    for body in _kids(root, scope, OFFICE_NS, "body"):
        for ss in _kids(body[0], body[1], OFFICE_NS, "spreadsheet"):
            for tbl, tscope in _kids(ss[0], ss[1], TABLE_NS, "table"):
                name = _attr(tbl, tscope, TABLE_NS, "name")
                if name is None:
                    raise ValueError("ods: table without a name")
                rows: list[list] = []
                for tr, trs in _kids(tbl, tscope, TABLE_NS, "table-row"):
                    row: list = []
                    for cell, cs in _kids(
                        tr, trs, TABLE_NS, "table-cell"
                    ):
                        rep_s = _attr(
                            cell, cs, TABLE_NS, "number-columns-repeated"
                        )
                        rep = int(rep_s) if rep_s is not None else 1
                        if rep < 1:
                            raise ValueError(
                                f"ods: non-positive repeat {rep}"
                            )
                        vt = _attr(cell, cs, OFFICE_NS, "value-type")
                        if vt == "float":
                            raw = _attr(cell, cs, OFFICE_NS, "value")
                            if raw is None:
                                raise ValueError(
                                    "ods: float cell without a value"
                                )
                            v = (
                                int(raw)
                                if raw.lstrip("-").isdigit()
                                else float(raw)
                            )
                        elif vt == "string":
                            ps = _kids(cell, cs, TEXT_NS, "p")
                            if not ps:
                                raise ValueError(
                                    "ods: string cell without text:p"
                                )
                            v = "\n".join(p[0].text for p in ps)
                        elif vt is None:
                            v = None  # covering empty cell
                        else:
                            raise NotImplementedError(
                                f"ods: value-type {vt!r} (dates/"
                                "currency are out of the fixture grammar)"
                            )
                        if rep > 1:
                            n_repeated += rep
                        row.extend([v] * rep)
                    rows.append(row)
                sheets.append((name, rows))
    if not sheets:
        raise ValueError("ods: no tables in the spreadsheet")
    return {"sheets": sheets, "n_repeated_cells": n_repeated}

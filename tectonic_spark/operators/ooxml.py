"""OOXML WordprocessingML (.docx) container codec — ECMA-376 / ISO
29500, the office-document format crawls encounter second only to PDF,
and a first-class training-data source (contracts, reports, theses all
arrive as .docx attachments).

A .docx file is a ZIP package (OPC, Open Packaging Conventions) whose
parts are XML.  This module is the document layer over the engine's own
archive.py ZIP codec and xmlparse.py XML parser:

* **Writer** (``build_docx``): deterministic fixture documents —
  ``[Content_Types].xml`` (defaults + overrides), the package
  relationship part ``_rels/.rels`` (officeDocument + core-properties
  relationships), ``word/document.xml`` (paragraphs with ``w:pPr``
  style markers, multi-run bodies with ``xml:space="preserve"`` where
  whitespace is load-bearing, ``w:tbl`` tables, ``w:br``/``w:tab``
  inside runs), and ``docProps/core.xml`` Dublin Core metadata.  A
  prefix lane binds the WordprocessingML namespace to a NON-standard
  prefix — conformant readers must match by namespace URI, never by
  the literal ``w:``.
* **Extractor** (``extract_docx``): OPC-correct resolution — the main
  part is found by following the ``officeDocument`` relationship from
  ``_rels/.rels`` (never by hardcoding ``word/document.xml``), its
  content type is verified against ``[Content_Types].xml``, and the
  body walk resolves XML namespaces through in-scope ``xmlns:``
  bindings.  Paragraph text concatenates runs (``w:t`` with
  ``xml:space`` honored, ``w:tab`` → TAB, ``w:br`` → NL); tables
  come back as rows of cell texts (cell paragraphs joined by NL);
  headings are recognized through ``w:pStyle``.

Error taxonomy: ``EOFError`` truncation (from the ZIP layer),
``ValueError`` structural (missing parts, wrong namespace, undeclared
content types).  No external entities can reach this code path —
xmlparse.py refuses DTD expansion by construction.

Reference framing: the reference engine (tectonic) stops at JSON/CSV
framing (core/json/Parser.scala, csv/Parser.scala) and has no office-
document surface; this module is beyond-reference crawl-ingestion
capability in the same evidence class as warc.py / woff2.py.
"""

from __future__ import annotations

from tectonic_spark.operators.archive import build_zip, parse_zip
from tectonic_spark.operators.xmlparse import Element, parse_xml

__all__ = ["build_docx", "extract_docx"]

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
XML_NS = "http://www.w3.org/XML/1998/namespace"  # the reserved xml: prefix
REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
CT_NS = "http://schemas.openxmlformats.org/package/2006/content-types"
CP_NS = (
    "http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
)
DC_NS = "http://purl.org/dc/elements/1.1/"

REL_OFFICE_DOC = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    "/officeDocument"
)
REL_CORE_PROPS = (
    "http://schemas.openxmlformats.org/package/2006/relationships"
    "/metadata/core-properties"
)
CT_DOCUMENT = (
    "application/vnd.openxmlformats-officedocument.wordprocessingml"
    ".document.main+xml"
)
CT_CORE = "application/vnd.openxmlformats-package.core-properties+xml"


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


# ------------------------------------------------------------------ writer


def build_docx(
    paragraphs: list[tuple[str, str]],
    *,
    title: str,
    creator: str,
    table_rows: list[list[str]] | None = None,
    w_prefix: str = "w",
) -> bytes:
    """Serialize a .docx package.  ``paragraphs`` are ``(style, text)``
    with style ``"Normal"`` / ``"Heading1"`` / ``"Heading2"``; text may
    contain ``\\t`` (written as ``w:tab``) and ``\\n`` (``w:br``).
    ``table_rows`` appends one table after the paragraphs.
    ``w_prefix`` is the lane that proves namespace-URI matching: any
    prefix is legal as long as it binds to the WordprocessingML URI."""
    p = w_prefix
    body: list[str] = []
    for style, text in paragraphs:
        runs = _runs_xml(p, text)
        ppr = (
            f"<{p}:pPr><{p}:pStyle {p}:val=\"{_esc(style)}\"/></{p}:pPr>"
            if style != "Normal"
            else ""
        )
        body.append(f"<{p}:p>{ppr}{runs}</{p}:p>")
    if table_rows is not None:
        cells = "".join(
            f"<{p}:tr>"
            + "".join(
                f"<{p}:tc><{p}:p>{_runs_xml(p, cell)}</{p}:p></{p}:tc>"
                for cell in row
            )
            + f"</{p}:tr>"
            for row in table_rows
        )
        body.append(f"<{p}:tbl>{cells}</{p}:tbl>")
    body.append(f"<{p}:sectPr/>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<{p}:document xmlns:{p}=\"{W_NS}\"><{p}:body>"
        + "".join(body)
        + f"</{p}:body></{p}:document>"
    ).encode()

    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="{CT_NS}">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        f'<Override PartName="/word/document.xml" ContentType="{CT_DOCUMENT}"/>'
        f'<Override PartName="/docProps/core.xml" ContentType="{CT_CORE}"/>'
        "</Types>"
    ).encode()
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{REL_NS}">'
        f'<Relationship Id="rId1" Type="{REL_OFFICE_DOC}"'
        ' Target="word/document.xml"/>'
        f'<Relationship Id="rId2" Type="{REL_CORE_PROPS}"'
        ' Target="docProps/core.xml"/>'
        "</Relationships>"
    ).encode()
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<cp:coreProperties xmlns:cp="{CP_NS}" xmlns:dc="{DC_NS}">'
        f"<dc:title>{_esc(title)}</dc:title>"
        f"<dc:creator>{_esc(creator)}</dc:creator>"
        "</cp:coreProperties>"
    ).encode()
    return build_zip(
        [
            ("[Content_Types].xml", content_types, "deflate"),
            ("_rels/.rels", rels, "deflate"),
            ("word/document.xml", document, "deflate"),
            ("docProps/core.xml", core, "deflate"),
        ]
    )


def _runs_xml(p: str, text: str) -> str:
    """Split paragraph text into alternating runs on word boundaries so
    extraction has to concatenate; TAB/NL become w:tab / w:br."""
    words = text.split(" ")
    mid = (len(words) + 1) // 2
    chunks = [" ".join(words[:mid]), " ".join(words[mid:])]
    runs = []
    for i, chunk in enumerate(chunks):
        if not chunk and i > 0:
            continue
        # inner boundary: first run keeps its trailing space so the
        # concatenation of run texts reproduces the paragraph exactly —
        # the separator exists whenever words continue past the split
        # point, even if the remainder joins to "" (trailing space)
        if i == 0 and len(words) > mid:
            chunk += " "
        parts = []
        for j, seg in enumerate(chunk.split("\t")):
            if j:
                parts.append(f"<{p}:tab/>")
            for k, piece in enumerate(seg.split("\n")):
                if k:
                    parts.append(f"<{p}:br/>")
                if piece:
                    space = (
                        ' xml:space="preserve"'
                        if piece != piece.strip()
                        else ""
                    )
                    parts.append(
                        f"<{p}:t{space}>{_esc(piece)}</{p}:t>"
                    )
        bold = f"<{p}:rPr><{p}:b/></{p}:rPr>" if i % 2 else ""
        runs.append(f"<{p}:r>{bold}{''.join(parts)}</{p}:r>")
    return "".join(runs)


# --------------------------------------------------------- namespace walk


def _resolve(el: Element, bindings: dict[str, str]) -> tuple[str, str, dict]:
    """Return (namespace URI, local name, child bindings) for ``el``,
    folding any xmlns declarations on the element into scope."""
    scope = bindings
    for k, v in el.attrs.items():
        if k == "xmlns" or k.startswith("xmlns:"):
            if scope is bindings:
                scope = dict(bindings)
            scope[k[6:] if k.startswith("xmlns:") else ""] = v
    tag = el.tag
    if ":" in tag:
        prefix, local = tag.split(":", 1)
    else:
        prefix, local = "", tag
    if prefix == "xml":
        return XML_NS, local, scope
    if prefix not in scope:
        if prefix:
            raise ValueError(f"undeclared namespace prefix {prefix!r}")
        return "", local, scope  # unprefixed, no default ns
    return scope[prefix], local, scope


def _attr(el: Element, bindings: dict[str, str], uri: str, local: str):
    """Namespace-aware attribute lookup (prefixes resolved in scope)."""
    for k, v in el.attrs.items():
        if k == "xmlns" or k.startswith("xmlns:"):
            continue
        if ":" in k:
            pfx, name = k.split(":", 1)
            if pfx == "xml":
                if uri == XML_NS and name == local:
                    return v
                continue
            if name == local and bindings.get(pfx) == uri:
                return v
        elif not uri and k == local:
            return v
    return None


# --------------------------------------------------------------- extractor


def extract_docx(data: bytes) -> dict:
    """Parse a .docx package → structured extraction dict.  OPC-correct:
    the main part is resolved through the package relationships, and the
    body walk matches elements by namespace URI."""
    members = {m["name"]: m["data"] for m in parse_zip(data)}
    if "[Content_Types].xml" not in members:
        raise ValueError("docx: missing [Content_Types].xml")
    content_types = _parse_content_types(members["[Content_Types].xml"])
    if "_rels/.rels" not in members:
        raise ValueError("docx: missing package relationships")
    rels = _parse_rels(members["_rels/.rels"])
    doc_part = rels.get(REL_OFFICE_DOC)
    if doc_part is None:
        raise ValueError("docx: no officeDocument relationship")
    if content_types.get("/" + doc_part) != CT_DOCUMENT:
        raise ValueError(
            f"docx: main part {doc_part!r} not declared as a"
            " WordprocessingML document"
        )
    if doc_part not in members:
        raise ValueError(f"docx: main part {doc_part!r} absent from package")

    root = parse_xml(members[doc_part], preserve_space=True)
    uri, local, scope = _resolve(root, {})
    if (uri, local) != (W_NS, "document"):
        raise ValueError(f"docx: root is {{{uri}}}{local}, not w:document")
    body = None
    for c in root.children:
        cu, cl, _ = _resolve(c, scope)
        if (cu, cl) == (W_NS, "body"):
            body = c
            break
    if body is None:
        raise ValueError("docx: document has no body")

    paragraphs: list[tuple[str, str]] = []
    tables: list[list[list[str]]] = []
    n_runs = 0
    _, _, bscope = _resolve(body, scope)
    for child in body.children:
        cu, cl, cscope = _resolve(child, bscope)
        if cu != W_NS:
            continue
        if cl == "p":
            style, text, nr = _paragraph(child, cscope)
            paragraphs.append((style, text))
            n_runs += nr
        elif cl == "tbl":
            tables.append(_table(child, cscope))
        elif cl == "sectPr":
            pass
        else:
            raise ValueError(f"docx: unexpected body child w:{cl}")

    out = {
        "paragraphs": paragraphs,
        "tables": tables,
        "n_runs": n_runs,
        "title": None,
        "creator": None,
    }
    core_part = rels.get(REL_CORE_PROPS)
    if core_part is not None and core_part in members:
        croot = parse_xml(members[core_part])
        _, _, cscope = _resolve(croot, {})
        for c in croot.children:
            cu, cl, _ = _resolve(c, cscope)
            if cu == DC_NS and cl in ("title", "creator"):
                out[cl] = c.text
    return out


def _paragraph(p: Element, scope: dict) -> tuple[str, str, int]:
    style = "Normal"
    pieces: list[str] = []
    n_runs = 0
    for c in p.children:
        cu, cl, cscope = _resolve(c, scope)
        if cu != W_NS:
            continue
        if cl == "pPr":
            for pc in c.children:
                pu, pl, pscope = _resolve(pc, cscope)
                if (pu, pl) == (W_NS, "pStyle"):
                    v = _attr(pc, pscope, W_NS, "val")
                    if v is not None:
                        style = v
        elif cl == "r":
            n_runs += 1
            for rc in c.children:
                ru, rl, rscope = _resolve(rc, cscope)
                if ru != W_NS:
                    continue
                if rl == "t":
                    pieces.append(rc.text)
                elif rl == "tab":
                    pieces.append("\t")
                elif rl == "br":
                    pieces.append("\n")
                # rPr: formatting only, no text
    return style, "".join(pieces), n_runs


def _table(tbl: Element, scope: dict) -> list[list[str]]:
    rows: list[list[str]] = []
    for tr in tbl.children:
        tu, tl, trscope = _resolve(tr, scope)
        if (tu, tl) != (W_NS, "tr"):
            continue
        row: list[str] = []
        for tc in tr.children:
            cu, cl, tcscope = _resolve(tc, trscope)
            if (cu, cl) != (W_NS, "tc"):
                continue
            cell_paras = []
            for pc in tc.children:
                pu, pl, pscope = _resolve(pc, tcscope)
                if (pu, pl) == (W_NS, "p"):
                    cell_paras.append(_paragraph(pc, pscope)[1])
            row.append("\n".join(cell_paras))
        rows.append(row)
    return rows


def _parse_rels(data: bytes) -> dict[str, str]:
    """Relationship Type URI → target part name (package-root relative)."""
    root = parse_xml(data)
    uri, local, scope = _resolve(root, {})
    if (uri, local) != (REL_NS, "Relationships"):
        raise ValueError("docx: malformed relationships part")
    out: dict[str, str] = {}
    for c in root.children:
        cu, cl, cscope = _resolve(c, scope)
        if (cu, cl) != (REL_NS, "Relationship"):
            continue
        rtype = _attr(c, cscope, "", "Type")
        target = _attr(c, cscope, "", "Target")
        if rtype is None or target is None:
            raise ValueError("docx: relationship missing Type/Target")
        out[rtype] = target.lstrip("/")
    return out


def _parse_content_types(data: bytes) -> dict[str, str]:
    """Override part name → content type (defaults kept by extension)."""
    root = parse_xml(data)
    uri, local, scope = _resolve(root, {})
    if (uri, local) != (CT_NS, "Types"):
        raise ValueError("docx: malformed [Content_Types].xml")
    overrides: dict[str, str] = {}
    defaults: dict[str, str] = {}
    for c in root.children:
        cu, cl, cscope = _resolve(c, scope)
        if cu != CT_NS:
            continue
        if cl == "Override":
            pn = _attr(c, cscope, "", "PartName")
            ct = _attr(c, cscope, "", "ContentType")
            if pn is None or ct is None:
                raise ValueError("docx: Override missing PartName/ContentType")
            overrides[pn] = ct
        elif cl == "Default":
            ext = _attr(c, cscope, "", "Extension")
            ct = _attr(c, cscope, "", "ContentType")
            if ext is None or ct is None:
                raise ValueError("docx: Default missing Extension/ContentType")
            defaults[ext.lower()] = ct

    class _CT(dict):
        def get(self, part, default=None):  # type: ignore[override]
            if part in overrides:
                return overrides[part]
            ext = part.rsplit(".", 1)[-1].lower() if "." in part else ""
            return defaults.get(ext, default)

    return _CT()


# -------------------------------------------------------------- XLSX layer
# SpreadsheetML (.xlsx) — the tabular sibling: workbook part resolved
# through the SAME OPC relationship machinery, sheets resolved through
# the workbook's OWN relationship part (xl/_rels/workbook.xml.rels),
# cell values through the shared-strings table (t="s" indices), inline
# strings (t="inlineStr") and numbers, with A1-style references
# cross-checked against each cell's actual position.

S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
R_NS = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)
REL_WORKSHEET = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    "/worksheet"
)
REL_SHARED_STRINGS = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    "/sharedStrings"
)
CT_WORKBOOK = (
    "application/vnd.openxmlformats-officedocument.spreadsheetml"
    ".sheet.main+xml"
)
CT_WORKSHEET = (
    "application/vnd.openxmlformats-officedocument.spreadsheetml"
    ".worksheet+xml"
)
CT_SHARED_STRINGS = (
    "application/vnd.openxmlformats-officedocument.spreadsheetml"
    ".sharedStrings+xml"
)


def col_letters(idx: int) -> str:
    """0-based column index → A1 letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def col_index(letters: str) -> int:
    """A1 letters → 0-based column index (inverse of col_letters)."""
    idx = 0
    for ch in letters:
        if not "A" <= ch <= "Z":
            raise ValueError(f"xlsx: bad column letters {letters!r}")
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def build_xlsx(
    sheets: list[tuple[str, list[list]]],
    *,
    inline_lane: bool = False,
) -> bytes:
    """Serialize a .xlsx.  ``sheets`` are ``(name, rows)``; each cell is
    an int/float (numeric cell) or str.  Strings go through the shared-
    strings table (deduplicated, the real-world default) unless
    ``inline_lane`` puts them inline (``t="inlineStr"``)."""
    shared: dict[str, int] = {}
    n_string_cells = 0
    if not inline_lane:
        for _, rows in sheets:
            for row in rows:
                for v in row:
                    if isinstance(v, str):
                        n_string_cells += 1
                        shared.setdefault(v, len(shared))

    def cell_xml(r: int, c: int, v) -> str:
        ref = f"{col_letters(c)}{r + 1}"
        if isinstance(v, str):
            if inline_lane:
                return (
                    f'<c r="{ref}" t="inlineStr"><is><t>{_esc(v)}</t>'
                    "</is></c>"
                )
            return f'<c r="{ref}" t="s"><v>{shared[v]}</v></c>'
        return f'<c r="{ref}"><v>{v!r}</v></c>'

    members: list[tuple[str, bytes, str]] = []
    sheet_parts = []
    for i, (_name, rows) in enumerate(sheets):
        rows_xml = "".join(
            f'<row r="{r + 1}">'
            + "".join(cell_xml(r, c, v) for c, v in enumerate(row))
            + "</row>"
            for r, row in enumerate(rows)
        )
        sheet_parts.append(
            (
                f"xl/worksheets/sheet{i + 1}.xml",
                (
                    '<?xml version="1.0" encoding="UTF-8" standalone='
                    f'"yes"?><worksheet xmlns="{S_NS}">'
                    f"<sheetData>{rows_xml}</sheetData></worksheet>"
                ).encode(),
            )
        )

    wb_sheets = "".join(
        f'<sheet name="{_esc(name)}" sheetId="{i + 1}" r:id="rSh{i + 1}"/>'
        for i, (name, _) in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{S_NS}" xmlns:r="{R_NS}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    ).encode()
    wb_rels = [
        f'<Relationship Id="rSh{i + 1}" Type="{REL_WORKSHEET}"'
        f' Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets))
    ]
    overrides = [
        f'<Override PartName="/xl/workbook.xml" ContentType="{CT_WORKBOOK}"/>'
    ] + [
        f'<Override PartName="/{p}" ContentType="{CT_WORKSHEET}"/>'
        for p, _ in sheet_parts
    ]
    if shared:
        sst = "".join(
            f"<si><t>{_esc(s)}</t></si>"
            for s, _ in sorted(shared.items(), key=lambda kv: kv[1])
        )
        members.append(
            (
                "xl/sharedStrings.xml",
                (
                    '<?xml version="1.0" encoding="UTF-8" standalone='
                    f'"yes"?><sst xmlns="{S_NS}" count="{n_string_cells}"'
                    f' uniqueCount="{len(shared)}">{sst}</sst>'
                ).encode(),
                "deflate",
            )
        )
        wb_rels.append(
            f'<Relationship Id="rSst" Type="{REL_SHARED_STRINGS}"'
            ' Target="sharedStrings.xml"/>'
        )
        overrides.append(
            '<Override PartName="/xl/sharedStrings.xml" ContentType='
            f'"{CT_SHARED_STRINGS}"/>'
        )

    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="{CT_NS}">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        + "".join(overrides)
        + "</Types>"
    ).encode()
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{REL_NS}">'
        f'<Relationship Id="rId1" Type="{REL_OFFICE_DOC}"'
        ' Target="xl/workbook.xml"/>'
        "</Relationships>"
    ).encode()
    wb_rels_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{REL_NS}">' + "".join(wb_rels)
        + "</Relationships>"
    ).encode()
    members = [
        ("[Content_Types].xml", content_types, "deflate"),
        ("_rels/.rels", rels, "deflate"),
        ("xl/workbook.xml", workbook, "deflate"),
        ("xl/_rels/workbook.xml.rels", wb_rels_xml, "deflate"),
    ] + members
    for p, b in sheet_parts:
        members.append((p, b, "deflate"))
    return build_zip(members)


def extract_xlsx(data: bytes) -> dict:
    """Parse a .xlsx → ``{sheets: [(name, rows)], n_shared_unique,
    n_string_cells, inline}``.  Cells come back typed (int/float/str);
    every cell's A1 reference is cross-checked against its position and
    shared-string indices are bounds-checked."""
    members = {m["name"]: m["data"] for m in parse_zip(data)}
    if "[Content_Types].xml" not in members:
        raise ValueError("xlsx: missing [Content_Types].xml")
    content_types = _parse_content_types(members["[Content_Types].xml"])
    rels = _parse_rels(members["_rels/.rels"])
    wb_part = rels.get(REL_OFFICE_DOC)
    if wb_part is None:
        raise ValueError("xlsx: no officeDocument relationship")
    if content_types.get("/" + wb_part) != CT_WORKBOOK:
        raise ValueError("xlsx: main part is not a SpreadsheetML workbook")
    wb_dir = wb_part.rsplit("/", 1)[0] if "/" in wb_part else ""
    wb_rels_name = (
        f"{wb_dir}/_rels/{wb_part.rsplit('/', 1)[-1]}.rels"
        if wb_dir
        else f"_rels/{wb_part}.rels"
    )
    if wb_rels_name not in members:
        raise ValueError("xlsx: missing workbook relationship part")
    wb_rels = _parse_rels_by_id(members[wb_rels_name])

    shared: list[str] = []
    n_string_cells = 0
    inline_seen = False
    sst_target = None
    for rid, (rtype, target) in wb_rels.items():
        if rtype == REL_SHARED_STRINGS:
            sst_target = _join_part(wb_dir, target)
    if sst_target is not None:
        if sst_target not in members:
            raise ValueError("xlsx: sharedStrings part absent")
        sroot = parse_xml(members[sst_target], preserve_space=True)
        su, sl, sscope = _resolve(sroot, {})
        if (su, sl) != (S_NS, "sst"):
            raise ValueError("xlsx: malformed sharedStrings")
        for si in sroot.children:
            iu, il, iscope = _resolve(si, sscope)
            if (iu, il) != (S_NS, "si"):
                continue
            t = None
            for tc in si.children:
                tu, tl, _ = _resolve(tc, iscope)
                if (tu, tl) == (S_NS, "t"):
                    t = tc.text
            if t is None:
                raise ValueError("xlsx: si without t")
            shared.append(t)
        declared = _attr(sroot, sscope, "", "uniqueCount")
        if declared is not None and int(declared) != len(shared):
            raise ValueError(
                f"xlsx: sharedStrings uniqueCount {declared} != "
                f"{len(shared)} actual"
            )

    wroot = parse_xml(members[wb_part])
    wu, wl, wscope = _resolve(wroot, {})
    if (wu, wl) != (S_NS, "workbook"):
        raise ValueError("xlsx: workbook root mismatch")
    sheets_out: list[tuple[str, list[list]]] = []
    for c in wroot.children:
        cu, cl, cscope = _resolve(c, wscope)
        if (cu, cl) != (S_NS, "sheets"):
            continue
        for sh in c.children:
            shu, shl, shscope = _resolve(sh, cscope)
            if (shu, shl) != (S_NS, "sheet"):
                continue
            name = _attr(sh, shscope, "", "name")
            rid = _attr(sh, shscope, R_NS, "id")
            if name is None or rid is None:
                raise ValueError("xlsx: sheet missing name/r:id")
            if rid not in wb_rels:
                raise ValueError(f"xlsx: dangling sheet r:id {rid!r}")
            rtype, target = wb_rels[rid]
            if rtype != REL_WORKSHEET:
                raise ValueError(f"xlsx: r:id {rid!r} is not a worksheet")
            part = _join_part(wb_dir, target)
            if part not in members:
                raise ValueError(f"xlsx: worksheet {part!r} absent")
            if content_types.get("/" + part) != CT_WORKSHEET:
                raise ValueError(
                    f"xlsx: {part!r} not declared as a worksheet"
                )
            rows, n_str, inl = _sheet_rows(members[part], shared)
            n_string_cells += n_str
            inline_seen = inline_seen or inl
            sheets_out.append((name, rows))
    if not sheets_out:
        raise ValueError("xlsx: workbook declares no sheets")
    return {
        "sheets": sheets_out,
        "n_shared_unique": len(shared),
        "n_string_cells": n_string_cells,
        "inline": inline_seen,
    }


def _sheet_rows(
    data: bytes, shared: list[str]
) -> tuple[list[list], int, bool]:
    root = parse_xml(data, preserve_space=True)
    u, l, scope = _resolve(root, {})
    if (u, l) != (S_NS, "worksheet"):
        raise ValueError("xlsx: worksheet root mismatch")
    rows: list[list] = []
    n_str = 0
    inline = False
    for sd in root.children:
        su, sl, sdscope = _resolve(sd, scope)
        if (su, sl) != (S_NS, "sheetData"):
            continue
        for row_el in sd.children:
            ru, rl, rscope = _resolve(row_el, sdscope)
            if (ru, rl) != (S_NS, "row"):
                continue
            r_decl = _attr(row_el, rscope, "", "r")
            r_idx = len(rows)
            if r_decl is not None and int(r_decl) != r_idx + 1:
                raise ValueError(
                    f"xlsx: row r={r_decl} at position {r_idx + 1}"
                )
            row: list = []
            for cell in row_el.children:
                cu, cl2, cscope = _resolve(cell, rscope)
                if (cu, cl2) != (S_NS, "c"):
                    continue
                ref = _attr(cell, cscope, "", "r")
                if ref is not None:
                    letters = ref.rstrip("0123456789")
                    digits = ref[len(letters) :]
                    if (
                        col_index(letters) != len(row)
                        or int(digits) != r_idx + 1
                    ):
                        raise ValueError(
                            f"xlsx: cell ref {ref} at row {r_idx + 1}"
                            f" col {len(row)}"
                        )
                ctype = _attr(cell, cscope, "", "t") or "n"
                v_el = None
                is_el = None
                for cc in cell.children:
                    ccu, ccl, _ = _resolve(cc, cscope)
                    if (ccu, ccl) == (S_NS, "v"):
                        v_el = cc
                    elif (ccu, ccl) == (S_NS, "is"):
                        is_el = cc
                if ctype == "s":
                    if v_el is None:
                        raise ValueError("xlsx: shared cell without v")
                    idx = int(v_el.text)
                    if not 0 <= idx < len(shared):
                        raise ValueError(
                            f"xlsx: shared index {idx} out of range"
                        )
                    row.append(shared[idx])
                    n_str += 1
                elif ctype == "inlineStr":
                    if is_el is None:
                        raise ValueError("xlsx: inlineStr cell without is")
                    t = None
                    _, _, iscope = _resolve(is_el, cscope)
                    for tc in is_el.children:
                        tu, tl, _ = _resolve(tc, iscope)
                        if (tu, tl) == (S_NS, "t"):
                            t = tc.text
                    if t is None:
                        raise ValueError("xlsx: is without t")
                    row.append(t)
                    n_str += 1
                    inline = True
                elif ctype == "n":
                    if v_el is None:
                        raise ValueError("xlsx: numeric cell without v")
                    txt = v_el.text
                    row.append(
                        int(txt)
                        if txt.lstrip("-").isdigit()
                        else float(txt)
                    )
                else:
                    raise NotImplementedError(
                        f"xlsx: cell type {ctype!r} (formulas/booleans"
                        " are out of the fixture grammar)"
                    )
            rows.append(row)
    return rows, n_str, inline


def _parse_rels_by_id(data: bytes) -> dict[str, tuple[str, str]]:
    """Relationship Id → (Type URI, target) — the form workbook-level
    parts need (one Type may repeat across many sheets)."""
    root = parse_xml(data)
    uri, local, scope = _resolve(root, {})
    if (uri, local) != (REL_NS, "Relationships"):
        raise ValueError("xlsx: malformed relationships part")
    out: dict[str, tuple[str, str]] = {}
    for c in root.children:
        cu, cl, cscope = _resolve(c, scope)
        if (cu, cl) != (REL_NS, "Relationship"):
            continue
        rid = _attr(c, cscope, "", "Id")
        rtype = _attr(c, cscope, "", "Type")
        target = _attr(c, cscope, "", "Target")
        if rid is None or rtype is None or target is None:
            raise ValueError("xlsx: relationship missing Id/Type/Target")
        if rid in out:
            raise ValueError(f"xlsx: duplicate relationship id {rid!r}")
        out[rid] = (rtype, target.lstrip("/"))
    return out


def _join_part(base_dir: str, target: str) -> str:
    import posixpath

    return (
        posixpath.normpath(posixpath.join(base_dir, target))
        if base_dir
        else target
    )

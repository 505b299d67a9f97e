"""EPUB (OCF + OPF) e-book container codec — the IDPF/W3C EPUB 3
packaging crawls meet wherever books are served, and a long-document
training-data source (novels, manuals, public-domain corpora ship as
.epub).

An EPUB is a ZIP with strict container rules (OCF) wrapping an XML
package manifest (OPF) that names XHTML content documents.  This module
rides archive.py (ZIP) and xmlparse.py (XML) exactly like ooxml.py:

* **Writer** (``build_epub``): the ``mimetype`` member FIRST and
  STORED (the OCF rule that makes ``file(1)`` and kernel sniffers
  work — bytes 30..58 of the file are the literal content type),
  ``META-INF/container.xml`` pointing at the OPF, the OPF package
  (``dc:`` metadata, manifest items, spine) and one XHTML content
  document per chapter.  The spine's reading order deliberately
  differs from manifest order (a rotation) — consumers must honor
  the spine, not directory order.
* **Extractor** (``extract_epub``): verifies the OCF invariants
  (first member named ``mimetype``, stored, exact payload), follows
  ``container.xml`` → rootfile → OPF (never hardcodes the path),
  resolves manifest ``id`` → ``href`` relative to the OPF directory,
  walks the SPINE in order, and extracts chapter titles (``h1``) and
  paragraph prose from each XHTML document.

Error taxonomy: ``EOFError`` truncation (ZIP layer), ``ValueError``
structural (OCF violations, dangling spine idrefs, missing parts).

Reference framing: beyond-reference crawl-ingestion surface (the
reference engine has no document-container layer); same evidence class
as ooxml.py / woff2.py.
"""

from __future__ import annotations

import posixpath

from tectonic_spark.operators.archive import build_zip, parse_zip
from tectonic_spark.operators.ooxml import _attr, _resolve
from tectonic_spark.operators.xmlparse import parse_xml

__all__ = ["build_epub", "extract_epub"]

MIMETYPE = b"application/epub+zip"
CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
OPF_NS = "http://www.idpf.org/2007/opf"
DC_NS = "http://purl.org/dc/elements/1.1/"
XHTML_NS = "http://www.w3.org/1999/xhtml"


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# ------------------------------------------------------------------ writer


def build_epub(
    chapters: list[tuple[str, str]],
    *,
    title: str,
    author: str,
    lang: str,
    spine_rotate: int = 0,
) -> bytes:
    """Serialize an EPUB.  ``chapters`` are ``(chapter_title, body)``
    in READING order; ``body`` paragraphs are split on ``\\n``.
    ``spine_rotate`` rotates the order chapter FILES are named/listed in
    the manifest while the spine keeps reading order — the lane that
    proves extraction follows the spine."""
    n = len(chapters)
    if n == 0:
        raise ValueError("epub: at least one chapter")
    rot = spine_rotate % n
    # reading position i lives in file chap{(i+rot)%n}.xhtml
    file_of = [(i + rot) % n for i in range(n)]

    members: list[tuple[str, bytes, str]] = [
        ("mimetype", MIMETYPE, "stored")  # OCF: first, uncompressed
    ]
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<container version="1.0" xmlns="{CONTAINER_NS}"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf"'
        ' media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    ).encode()
    members.append(("META-INF/container.xml", container, "deflate"))

    manifest_items = "".join(
        f'<item id="c{k}" href="chap{k}.xhtml"'
        ' media-type="application/xhtml+xml"/>'
        for k in range(n)  # manifest in FILE order
    )
    spine_refs = "".join(
        f'<itemref idref="c{file_of[i]}"/>' for i in range(n)
    )
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{OPF_NS}" version="3.0" unique-identifier="uid">'
        f'<metadata xmlns:dc="{DC_NS}">'
        f'<dc:identifier id="uid">urn:doc:{_esc(title)}</dc:identifier>'
        f"<dc:title>{_esc(title)}</dc:title>"
        f"<dc:creator>{_esc(author)}</dc:creator>"
        f"<dc:language>{_esc(lang)}</dc:language>"
        "</metadata>"
        f"<manifest>{manifest_items}</manifest>"
        f"<spine>{spine_refs}</spine>"
        "</package>"
    ).encode()
    members.append(("OEBPS/content.opf", opf, "deflate"))

    for i, (ctitle, body) in enumerate(chapters):
        k = file_of[i]
        paras = "".join(
            f"<p>{_esc(p)}</p>" for p in body.split("\n") if p
        )
        xhtml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            f'<html xmlns="{XHTML_NS}"><head>'
            f"<title>{_esc(ctitle)}</title></head>"
            f"<body><h1>{_esc(ctitle)}</h1>{paras}</body></html>"
        ).encode()
        members.append((f"OEBPS/chap{k}.xhtml", xhtml, "deflate"))
    return build_zip(members)


# --------------------------------------------------------------- extractor


def extract_epub(data: bytes) -> dict:
    """Parse an EPUB → structured extraction dict, enforcing the OCF
    container rules and following container.xml → OPF → spine."""
    members = parse_zip(data)
    if not members or members[0]["name"] != "mimetype":
        raise ValueError("epub: first member must be 'mimetype' (OCF 3.0)")
    if members[0]["method"] != 0:
        raise ValueError(
            "epub: mimetype member must be stored (method 0), found"
            f" method {members[0]['method']}"
        )
    if members[0]["data"] != MIMETYPE:
        raise ValueError("epub: wrong mimetype payload")
    by_name = {m["name"]: m["data"] for m in members}

    if "META-INF/container.xml" not in by_name:
        raise ValueError("epub: missing META-INF/container.xml")
    croot = parse_xml(by_name["META-INF/container.xml"])
    cu, cl, cscope = _resolve(croot, {})
    if (cu, cl) != (CONTAINER_NS, "container"):
        raise ValueError("epub: malformed container.xml")
    opf_path = None
    for rf in _descend(croot, cscope, CONTAINER_NS, "rootfiles"):
        for r in _descend(rf[0], rf[1], CONTAINER_NS, "rootfile"):
            mt = _attr(r[0], r[1], "", "media-type")
            if mt == "application/oebps-package+xml":
                opf_path = _attr(r[0], r[1], "", "full-path")
                break
    if opf_path is None:
        raise ValueError("epub: no package rootfile declared")
    if opf_path not in by_name:
        raise ValueError(f"epub: rootfile {opf_path!r} absent")
    opf_dir = posixpath.dirname(opf_path)

    proot = parse_xml(by_name[opf_path])
    pu, pl, pscope = _resolve(proot, {})
    if (pu, pl) != (OPF_NS, "package"):
        raise ValueError("epub: OPF root is not opf:package")
    meta = {"title": None, "author": None, "lang": None}
    manifest: dict[str, str] = {}
    spine_ids: list[str] = []
    for c in proot.children:
        u, l, scope = _resolve(c, pscope)
        if u != OPF_NS:
            continue
        if l == "metadata":
            for mch in c.children:
                mu, ml, _ = _resolve(mch, scope)
                if mu != DC_NS:
                    continue
                if ml == "title":
                    meta["title"] = mch.text
                elif ml == "creator":
                    meta["author"] = mch.text
                elif ml == "language":
                    meta["lang"] = mch.text
        elif l == "manifest":
            for item, iscope in _descend(c, scope, OPF_NS, "item"):
                iid = _attr(item, iscope, "", "id")
                href = _attr(item, iscope, "", "href")
                if iid is None or href is None:
                    raise ValueError("epub: manifest item missing id/href")
                if iid in manifest:
                    raise ValueError(f"epub: duplicate manifest id {iid!r}")
                manifest[iid] = href
        elif l == "spine":
            for ref, rscope in _descend(c, scope, OPF_NS, "itemref"):
                idref = _attr(ref, rscope, "", "idref")
                if idref is None:
                    raise ValueError("epub: itemref missing idref")
                spine_ids.append(idref)
    if not spine_ids:
        raise ValueError("epub: empty spine")

    chapters: list[tuple[str, str]] = []
    for idref in spine_ids:
        if idref not in manifest:
            raise ValueError(f"epub: spine idref {idref!r} not in manifest")
        part = posixpath.normpath(posixpath.join(opf_dir, manifest[idref]))
        if part not in by_name:
            raise ValueError(f"epub: content document {part!r} absent")
        chapters.append(_chapter(by_name[part]))
    return {
        "title": meta["title"],
        "author": meta["author"],
        "lang": meta["lang"],
        "chapters": chapters,
        "n_manifest": len(manifest),
        "spine_ids": spine_ids,
    }


def _descend(el, scope, uri, local):
    out = []
    for c in el.children:
        cu, cl, cscope = _resolve(c, scope)
        if (cu, cl) == (uri, local):
            out.append((c, cscope))
    return out


def _chapter(data: bytes) -> tuple[str, str]:
    root = parse_xml(data, preserve_space=True)
    u, l, scope = _resolve(root, {})
    if (u, l) != (XHTML_NS, "html"):
        raise ValueError("epub: content document is not XHTML")
    title = ""
    paras: list[str] = []
    for body, bscope in _descend(root, scope, XHTML_NS, "body"):
        for c in body.children:
            cu, cl, _ = _resolve(c, bscope)
            if cu != XHTML_NS:
                continue
            if cl == "h1":
                title = c.text
            elif cl == "p":
                paras.append(c.text)
    return title, "\n".join(paras)

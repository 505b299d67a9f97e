"""Cross-implementation pins for the document-format stack — the
evidence-class upgrade from self-consistency to independent-reader
agreement (the brotli-vs-libbrotli pattern, using what this container
actually ships):

* the stdlib ``zipfile`` is an INDEPENDENT ZIP implementation: it must
  read every package our archive.py writer emits (names, payloads,
  compression methods), and our parse_zip must read what ``zipfile``
  WRITES;
* the stdlib ``xml.etree.ElementTree`` is an INDEPENDENT XML parser:
  document/content parts our writers emit must parse identically —
  paragraph text extracted through ElementTree's namespace-aware API
  must equal what our xmlparse-based extractors return.
"""

import io
import xml.etree.ElementTree as ET
import zipfile

from tectonic_spark.operators.archive import build_zip, parse_zip
from tectonic_spark.operators.epub import build_epub
from tectonic_spark.operators.odf import (
    OFFICE_NS,
    TEXT_NS,
    build_ods,
    build_odt,
    extract_ods,
    extract_odt,
)
from tectonic_spark.operators.ooxml import W_NS, build_docx, extract_docx

# ------------------------------------------------------------ ZIP layer


def test_zipfile_reads_our_archives():
    members = [
        ("a/b.xml", b"<x>1</x>", "deflate"),
        ("mimetype", b"application/epub+zip", "stored"),
        ("deep/nested/path.bin", bytes(range(256)) * 7, "deflate"),
    ]
    data = build_zip(members)
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        assert zf.namelist() == [name for name, _, _ in members]
        for name, payload, method in members:
            info = zf.getinfo(name)
            assert zf.read(name) == payload
            assert info.compress_type == (
                zipfile.ZIP_STORED if method == "stored"
                else zipfile.ZIP_DEFLATED
            )
        assert zf.testzip() is None  # CRC audit by the independent reader


def test_our_parser_reads_zipfile_archives():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("one.txt", b"payload one")
        zf.writestr(
            "two/stored.bin", bytes(500),
            compress_type=zipfile.ZIP_STORED,
        )
    members = parse_zip(buf.getvalue())
    assert [(m["name"], m["data"]) for m in members] == [
        ("one.txt", b"payload one"),
        ("two/stored.bin", bytes(500)),
    ]


def test_zipfile_reads_real_packages():
    for data in (
        build_docx([("Normal", "alpha beta")], title="t", creator="c"),
        build_epub([("c", "line")], title="t", author="a", lang="en"),
        build_odt([(0, "alpha  beta")], title="t"),
        build_ods([("s", [[1, 1, "x"]])]),
    ):
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            assert zf.testzip() is None


# ------------------------------------------------------------ XML layer


def test_elementtree_agrees_on_docx_paragraphs():
    paras = [
        ("Heading1", "the first line"),
        ("Normal", "alpha beta  double-space gamma"),
        ("Normal", "tail "),
    ]
    for prefix in ("w", "zz"):
        data = build_docx(
            paras, title="t", creator="c", w_prefix=prefix
        )
        ours = extract_docx(data)["paragraphs"]
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            root = ET.fromstring(zf.read("word/document.xml"))
        et_paras = []
        body = root.find(f"{{{W_NS}}}body")
        for p in body.findall(f"{{{W_NS}}}p"):
            text = "".join(
                t.text or ""
                for t in p.iter(f"{{{W_NS}}}t")
            )
            et_paras.append(text)
        assert [t for _, t in ours] == et_paras
        assert [t for _, t in paras] == et_paras


def test_elementtree_agrees_on_odt_text():
    paras = [(1, "head line"), (0, "a  b   c"), (0, " lead and trail ")]
    data = build_odt(paras, title="t")
    ours = extract_odt(data)["paragraphs"]
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    et_paras = []
    for el in root.iter():
        if el.tag in (f"{{{TEXT_NS}}}p", f"{{{TEXT_NS}}}h"):
            # expand text:s / text:tab / text:line-break through the
            # INDEPENDENT parser's mixed-content model (text/tail)
            parts = []

            def rec(e):
                parts.append(e.text or "")
                for c in e:
                    if c.tag == f"{{{TEXT_NS}}}s":
                        n = c.get(f"{{{TEXT_NS}}}c")
                        parts.append(" " * (int(n) if n else 1))
                    elif c.tag == f"{{{TEXT_NS}}}tab":
                        parts.append("\t")
                    elif c.tag == f"{{{TEXT_NS}}}line-break":
                        parts.append("\n")
                    else:
                        rec(c)
                    parts.append(c.tail or "")

            rec(el)
            et_paras.append("".join(parts))
    assert [t for _, t in ours] == et_paras
    assert [t for _, t in paras] == et_paras


def test_elementtree_agrees_on_ods_cells():
    sheets = [("s", [[7, 7, 7, "x  y"], [1.5, "a", "a"]])]
    data = build_ods(sheets)
    ours = extract_ods(data)["sheets"]
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    tns = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
    et_rows = []
    for tr in root.iter(f"{{{tns}}}table-row"):
        row = []
        for cell in tr.findall(f"{{{tns}}}table-cell"):
            rep = int(cell.get(f"{{{tns}}}number-columns-repeated", "1"))
            vt = cell.get(f"{{{OFFICE_NS}}}value-type")
            if vt == "float":
                raw = cell.get(f"{{{OFFICE_NS}}}value")
                v = int(raw) if raw.lstrip("-").isdigit() else float(raw)
            else:
                v = "".join(
                    p.text or ""
                    for p in cell.iter(f"{{{TEXT_NS}}}p")
                )
            row.extend([v] * rep)
        et_rows.append(row)
    assert ours[0][1] == et_rows
    assert sheets[0][1] == et_rows

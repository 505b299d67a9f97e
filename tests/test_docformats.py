"""Unit tests for the document-format codecs: ooxml.py (.docx),
epub.py (.epub), rtf.py (.rtf) and the ICO favicon codec in codecs.py.
Round-trip matrices plus the error taxonomy (EOFError truncation,
ValueError structural, NotImplementedError named refusals)."""

import struct

import pytest

from tectonic_spark.operators.archive import build_zip
from tectonic_spark.operators.codecs import encode_ico, parse_ico
from tectonic_spark.operators.epub import build_epub, extract_epub
from tectonic_spark.operators.ooxml import build_docx, extract_docx
from tectonic_spark.operators.rtf import build_rtf, extract_rtf

# ------------------------------------------------------------------- DOCX

PARAS = [
    ("Heading1", "the title line"),
    ("Normal", "a small data filter column part row window"),
    ("Normal", "tabbed\tvalue and\nbroken line"),
    ("Heading2", "sub"),
    ("Normal", "x"),
]
TABLE = [["cell a", "cell b"], ["c", "multi word cell"]]


@pytest.mark.parametrize("prefix", ["w", "ns0", "word"])
def test_docx_roundtrip(prefix):
    data = build_docx(
        PARAS, title="doc 17", creator="crawler", table_rows=TABLE,
        w_prefix=prefix,
    )
    out = extract_docx(data)
    assert out["paragraphs"] == PARAS
    assert out["tables"] == [TABLE]
    assert out["title"] == "doc 17"
    assert out["creator"] == "crawler"
    assert out["n_runs"] >= len(PARAS)


def test_docx_preserves_edge_whitespace():
    paras = [("Normal", "lead  mid   trail"), ("Normal", "a  b")]
    out = extract_docx(build_docx(paras, title="t", creator="c"))
    assert out["paragraphs"] == paras


def test_docx_no_table():
    out = extract_docx(build_docx(PARAS[:2], title="t", creator="c"))
    assert out["tables"] == []


def test_docx_escapes():
    paras = [("Normal", 'angle <b> & "quote" done')]
    out = extract_docx(build_docx(paras, title="a & b", creator="c"))
    assert out["paragraphs"] == paras
    assert out["title"] == "a & b"


def test_docx_missing_content_types():
    bad = build_zip([("word/document.xml", b"<d/>", "deflate")])
    with pytest.raises(ValueError, match="Content_Types"):
        extract_docx(bad)


def test_docx_missing_rels():
    good = build_docx(PARAS[:1], title="t", creator="c")
    from tectonic_spark.operators.archive import parse_zip

    members = [
        (m["name"], m["data"], "deflate")
        for m in parse_zip(good)
        if m["name"] != "_rels/.rels"
    ]
    with pytest.raises(ValueError, match="relationships"):
        extract_docx(build_zip(members))


def test_docx_wrong_namespace_refused():
    # document.xml whose root binds the prefix to the WRONG namespace
    members = [
        (
            "[Content_Types].xml",
            (
                '<Types xmlns="http://schemas.openxmlformats.org/package'
                '/2006/content-types">'
                '<Default Extension="rels" ContentType="application/vnd.'
                'openxmlformats-package.relationships+xml"/>'
                '<Override PartName="/word/document.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.'
                'wordprocessingml.document.main+xml"/>'
                "</Types>"
            ).encode(),
            "deflate",
        ),
        (
            "_rels/.rels",
            (
                '<Relationships xmlns="http://schemas.openxmlformats.org'
                '/package/2006/relationships">'
                '<Relationship Id="rId1" Type="http://schemas.'
                "openxmlformats.org/officeDocument/2006/relationships"
                '/officeDocument" Target="word/document.xml"/>'
                "</Relationships>"
            ).encode(),
            "deflate",
        ),
        (
            "word/document.xml",
            b'<w:document xmlns:w="urn:wrong"><w:body/></w:document>',
            "deflate",
        ),
    ]
    with pytest.raises(ValueError, match="not w:document"):
        extract_docx(build_zip(members))


def test_docx_truncation_is_eof():
    data = build_docx(PARAS[:1], title="t", creator="c")
    with pytest.raises(EOFError):
        extract_docx(data[: len(data) // 2])


# ------------------------------------------------------------------- EPUB

CHAPS = [
    ("Intro", "first line\nsecond line"),
    ("Middle", "one paragraph"),
    ("End", "a\nb\nc"),
]


@pytest.mark.parametrize("rot", [0, 1, 2])
def test_epub_roundtrip_spine_rotation(rot):
    data = build_epub(
        CHAPS, title="Doc 42", author="crawler", lang="en",
        spine_rotate=rot,
    )
    out = extract_epub(data)
    assert out["chapters"] == CHAPS  # spine order, not file order
    assert out["title"] == "Doc 42"
    assert out["author"] == "crawler"
    assert out["lang"] == "en"
    assert out["n_manifest"] == 3
    assert out["spine_ids"][0] == f"c{rot % 3}"


def test_epub_mimetype_must_be_first_and_stored():
    good = build_epub(CHAPS[:1], title="t", author="a", lang="en")
    from tectonic_spark.operators.archive import parse_zip

    members = parse_zip(good)
    # deflate the mimetype → OCF violation
    reordered = [(m["name"], m["data"], "deflate") for m in members]
    with pytest.raises(ValueError, match="stored"):
        extract_epub(build_zip(reordered))
    # drop it entirely
    dropped = [
        (m["name"], m["data"], "deflate")
        for m in members
        if m["name"] != "mimetype"
    ]
    with pytest.raises(ValueError, match="mimetype"):
        extract_epub(build_zip(dropped))


def test_epub_wrong_mimetype_payload():
    good = build_epub(CHAPS[:1], title="t", author="a", lang="en")
    from tectonic_spark.operators.archive import parse_zip

    members = [
        (
            m["name"],
            b"text/plain" if m["name"] == "mimetype" else m["data"],
            "stored" if m["name"] == "mimetype" else "deflate",
        )
        for m in parse_zip(good)
    ]
    with pytest.raises(ValueError, match="wrong mimetype"):
        extract_epub(build_zip(members))


def test_epub_truncation_is_eof():
    data = build_epub(CHAPS, title="t", author="a", lang="en")
    with pytest.raises(EOFError):
        extract_epub(data[:-7])


# -------------------------------------------------------------------- RTF

RTF_PARAS = [
    "a small data filter column",
    "tabbed\tvalue and\nbroken line",
    "café naïve € 中文 ok",
    "braces {x} and back\\slash",
]


@pytest.mark.parametrize("bold_every", [0, 2, 3])
def test_rtf_roundtrip(bold_every):
    data = build_rtf(RTF_PARAS, title="doc é", bold_every=bold_every)
    out = extract_rtf(data)
    assert out["text"] == "\n".join(RTF_PARAS)
    assert out["title"] == "doc é"


def test_rtf_uc_scoping():
    # \uc is group-scoped: a \uc2 inside a group must not leak out
    src = b"{\\rtf1\\uc1 a{\\uc2 \\u233xy}b\\u234? c}"
    out = extract_rtf(src)
    #   \u233 swallows "xy" (uc=2 in group); \u234 swallows "?" (uc=1)
    assert out["text"] == "a" + chr(233) + "b" + chr(234) + " c"


def test_rtf_negative_unicode():
    # signed-16 rule: \u-10179 is U+D83D... use BMP-safe: -1 → 0xFFFF
    out = extract_rtf(b"{\\rtf1\\uc1 x\\u-4096?y}")
    assert out["text"] == "x" + chr(0x10000 - 4096) + "y"


def test_rtf_skip_destinations():
    src = (
        b"{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\colortbl;\\red1\\green2"
        b"\\blue3;}{\\*\\mystery junk here}visible}"
    )
    assert extract_rtf(src)["text"] == "visible"


def test_rtf_hex_escape_cp1252():
    out = extract_rtf(b"{\\rtf1 caf\\'e9 \\'80}")
    assert out["text"] == "caf\xe9 €"  # 0x80 is the euro in cp1252


def test_rtf_taxonomy():
    with pytest.raises(ValueError):
        extract_rtf(b"not rtf")
    with pytest.raises(EOFError):
        extract_rtf(b"{\\rtf1 unclosed")
    with pytest.raises(EOFError):
        extract_rtf(b"{\\rtf1 trailing\\")
    with pytest.raises(ValueError):
        extract_rtf(b"{\\rtf1 \\'zz}")


# -------------------------------------------------------------------- ICO


def _px(w, h, seed):
    return bytes((i * seed + 3) % 256 for i in range(w * h * 3))


def test_ico_roundtrip_mixed():
    imgs = [
        {"w": 16, "h": 16, "fmt": "bmp", "pixels": _px(16, 16, 7)},
        {"w": 33, "h": 9, "fmt": "bmp", "pixels": _px(33, 9, 11)},
        {"w": 48, "h": 48, "fmt": "png", "pixels": _px(48, 48, 13)},
        {"w": 256, "h": 256, "fmt": "png", "pixels": _px(256, 256, 3)},
    ]
    back = parse_ico(encode_ico(imgs))
    assert [(b["w"], b["h"], b["fmt"]) for b in back] == [
        (i["w"], i["h"], i["fmt"]) for i in imgs
    ]
    for a, b in zip(imgs, back):
        assert a["pixels"] == b["pixels"]


def test_ico_256_encodes_as_zero():
    data = encode_ico(
        [{"w": 256, "h": 256, "fmt": "png", "pixels": _px(256, 256, 5)}]
    )
    assert data[6] == 0 and data[7] == 0  # width/height bytes


def test_ico_dim_mismatch_refused():
    data = bytearray(
        encode_ico([{"w": 16, "h": 16, "fmt": "bmp",
                     "pixels": _px(16, 16, 7)}])
    )
    data[6] = 17  # directory width no longer matches the DIB
    with pytest.raises(ValueError, match="DIB"):
        parse_ico(bytes(data))


def test_ico_taxonomy():
    with pytest.raises(ValueError):
        parse_ico(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)  # type 2=cur
    with pytest.raises(EOFError):
        parse_ico(b"\x00\x00\x01\x00\x02\x00" + b"\x00" * 16)
    good = encode_ico(
        [{"w": 8, "h": 8, "fmt": "bmp", "pixels": _px(8, 8, 9)}]
    )
    with pytest.raises(EOFError):
        parse_ico(good[:-10])
    with pytest.raises(ValueError, match="trailing"):
        parse_ico(good + b"\x00")


def test_ico_noncontiguous_refused():
    good = bytearray(
        encode_ico([{"w": 8, "h": 8, "fmt": "bmp",
                     "pixels": _px(8, 8, 9)}])
    )
    off = struct.unpack_from("<I", good, 6 + 12)[0]
    struct.pack_into("<I", good, 6 + 12, off + 4)
    with pytest.raises(ValueError, match="contiguous"):
        parse_ico(bytes(good))


# ------------------------------------------------------------------- XLSX

from tectonic_spark.operators.ooxml import (  # noqa: E402
    build_xlsx,
    col_index,
    col_letters,
    extract_xlsx,
)

SHEETS = [
    ("data", [[17, "w0", 1], [20, "w1", 2], [23, "w0", 3]]),
    ("extra", [[5, 9], [7, 11]]),
]


@pytest.mark.parametrize("inline", [False, True])
def test_xlsx_roundtrip(inline):
    out = extract_xlsx(build_xlsx(SHEETS, inline_lane=inline))
    assert out["sheets"] == SHEETS
    assert out["inline"] == inline
    assert out["n_string_cells"] == 3
    assert out["n_shared_unique"] == (0 if inline else 2)


def test_xlsx_floats_and_negatives():
    sheets = [("s", [[-4, 2.5], [1.25, -0.5]])]
    assert extract_xlsx(build_xlsx(sheets))["sheets"] == sheets


def test_xlsx_col_letters():
    for i in (0, 1, 25, 26, 27, 51, 52, 701, 702):
        assert col_index(col_letters(i)) == i
    assert col_letters(0) == "A" and col_letters(26) == "AA"
    assert col_letters(701) == "ZZ" and col_letters(702) == "AAA"


def test_xlsx_shared_index_bounds():
    data = build_xlsx(SHEETS)
    # corrupt: bump a shared index beyond the table inside sheet1
    from tectonic_spark.operators.archive import parse_zip

    members = []
    for m in parse_zip(data):
        body = m["data"]
        if m["name"] == "xl/worksheets/sheet1.xml":
            body = body.replace(b't="s"><v>0<', b't="s"><v>9<', 1)
        members.append((m["name"], body, "deflate"))
    with pytest.raises(ValueError, match="out of range"):
        extract_xlsx(build_zip(members))


def test_xlsx_cell_ref_mismatch():
    data = build_xlsx([("s", [[1, 2]])])
    from tectonic_spark.operators.archive import parse_zip

    members = []
    for m in parse_zip(data):
        body = m["data"]
        if m["name"] == "xl/worksheets/sheet1.xml":
            body = body.replace(b'r="B1"', b'r="C1"')
        members.append((m["name"], body, "deflate"))
    with pytest.raises(ValueError, match="cell ref"):
        extract_xlsx(build_zip(members))


def test_xlsx_unique_count_verified():
    data = build_xlsx(SHEETS)
    from tectonic_spark.operators.archive import parse_zip

    members = []
    for m in parse_zip(data):
        body = m["data"]
        if m["name"] == "xl/sharedStrings.xml":
            body = body.replace(b'uniqueCount="2"', b'uniqueCount="5"')
        members.append((m["name"], body, "deflate"))
    with pytest.raises(ValueError, match="uniqueCount"):
        extract_xlsx(build_zip(members))


def test_xlsx_formula_cells_refused():
    data = build_xlsx([("s", [[1]])])
    from tectonic_spark.operators.archive import parse_zip

    members = []
    for m in parse_zip(data):
        body = m["data"]
        if m["name"] == "xl/worksheets/sheet1.xml":
            body = body.replace(b'<c r="A1">', b'<c r="A1" t="b">')
        members.append((m["name"], body, "deflate"))
    with pytest.raises(NotImplementedError, match="cell type"):
        extract_xlsx(build_zip(members))


# -------------------------------------------------- structured data

from tectonic_spark.operators.structured_data import (  # noqa: E402
    build_page,
    extract_structured,
)


@pytest.mark.parametrize("syntax", ["jsonld", "microdata", "og"])
def test_structured_roundtrip(syntax):
    page = build_page(
        syntax=syntax,
        headline='doc 17 "quoted" & more',
        author="crawler 3",
        word_count=42,
        body_words="some body words",
    )
    out = extract_structured(page)
    assert out["syntax"] == syntax
    assert out["sd_type"] == "Article"
    assert out["headline"] == 'doc 17 "quoted" & more'
    assert out["author"] == "crawler 3"
    assert out["word_count"] == 42


def test_structured_microdata_nested_item():
    # the author Person is a NESTED item, not a flat string
    page = build_page(
        syntax="microdata", headline="h", author="a", word_count=1
    )
    out = extract_structured(page)
    assert out["author"] == "a"


def test_structured_itemprop_outside_scope_refused():
    bad = (
        b'<html xmlns="http://www.w3.org/1999/xhtml"><head>'
        b"<title>t</title></head><body>"
        b'<span itemprop="headline">x</span></body></html>'
    )
    with pytest.raises(ValueError, match="outside any itemscope"):
        extract_structured(bad)


def test_structured_malformed_jsonld_refused():
    bad = (
        b'<html xmlns="http://www.w3.org/1999/xhtml"><head>'
        b"<title>t</title></head><body>"
        b'<script type="application/ld+json">{nope}</script>'
        b"</body></html>"
    )
    with pytest.raises(ValueError, match="malformed JSON-LD"):
        extract_structured(bad)


def test_structured_og_requires_title_and_type():
    bad = (
        b'<html xmlns="http://www.w3.org/1999/xhtml"><head>'
        b'<meta property="og:title" content="x"/>'
        b"</head><body/></html>"
    )
    with pytest.raises(ValueError, match="og:title and og:type"):
        extract_structured(bad)


def test_structured_none_refused():
    bad = (
        b'<html xmlns="http://www.w3.org/1999/xhtml"><head>'
        b"<title>x</title></head><body/></html>"
    )
    with pytest.raises(ValueError, match="no structured data"):
        extract_structured(bad)


# -------------------------------------------------------------------- ODT

from tectonic_spark.operators.odf import build_odt, extract_odt  # noqa: E402

ODT_PARAS = [
    (1, "the title line"),
    (0, "a small data filter column part row"),
    (0, "tabbed\tvalue and\nbroken line"),
    (2, "sub head"),
    (0, "double  space   run and trailing "),
    (0, " leading space"),
]


def test_odt_roundtrip():
    out = extract_odt(build_odt(ODT_PARAS, title="odt doc & co"))
    assert out["paragraphs"] == ODT_PARAS
    assert out["title"] == "odt doc & co"


def test_odt_whitespace_rule():
    # the ODF rule: literal runs of spaces must ride text:s — feed
    # pathological spacing and demand exact recovery
    paras = [(0, "a" + " " * 7 + "b"), (0, " " * 3 + "c" + " " * 2)]
    out = extract_odt(build_odt(paras, title="t"))
    assert out["paragraphs"] == paras


def test_odt_mimetype_rules():
    from tectonic_spark.operators.archive import parse_zip

    good = build_odt(ODT_PARAS[:1], title="t")
    deflated = build_zip(
        [(m["name"], m["data"], "deflate") for m in parse_zip(good)]
    )
    with pytest.raises(ValueError, match="stored"):
        extract_odt(deflated)
    wrong = build_zip(
        [
            (
                m["name"],
                b"text/plain" if m["name"] == "mimetype" else m["data"],
                "stored" if m["name"] == "mimetype" else "deflate",
            )
            for m in parse_zip(good)
        ]
    )
    with pytest.raises(ValueError, match="wrong mimetype"):
        extract_odt(wrong)


def test_odt_unmanifested_part_refused():
    from tectonic_spark.operators.archive import parse_zip

    good = build_odt(ODT_PARAS[:1], title="t")
    members = [
        (m["name"], m["data"], "stored" if m["name"] == "mimetype"
         else "deflate")
        for m in parse_zip(good)
    ]
    members.append(("extra.xml", b"<x/>", "deflate"))
    with pytest.raises(ValueError, match="not in the manifest"):
        extract_odt(build_zip(members))


def test_odt_truncation_is_eof():
    data = build_odt(ODT_PARAS, title="t")
    with pytest.raises(EOFError):
        extract_odt(data[:-9])


def test_xmlparse_mixed_content_order():
    # the ordered view Element.content preserves what .text+.children
    # cannot: interleaving
    from tectonic_spark.operators.xmlparse import parse_xml

    root = parse_xml(b"<p>alpha<b/>beta<i/>gamma</p>",
                     preserve_space=True)
    kinds = [
        item if isinstance(item, str) else f"<{item.tag}>"
        for item in root.content
    ]
    assert kinds == ["alpha", "<b>", "beta", "<i>", "gamma"]
    assert root.text == "alphabetagamma"


# -------------------------------------------------------------------- SVG

from tectonic_spark.operators.svg import (  # noqa: E402
    build_svg,
    census_svg,
    parse_path,
)


def test_svg_path_tight_tokenization():
    p = parse_path("M.5.5L1-2")
    assert p["endpoint"] == (1, -2)
    assert p["per_cmd"] == {"M": 1, "L": 1}


def test_svg_path_implicit_repetition():
    # after M, implicit repetition is LINETO per spec
    p = parse_path("M 0 0 10 0 10 10 Z")
    assert p["per_cmd"] == {"M": 1, "L": 2, "Z": 1}
    assert p["n_implicit"] == 2
    assert p["endpoint"] == (0, 0)  # Z returns to subpath start


def test_svg_path_relative_and_reflection():
    p = parse_path("m1 1 h4 v4 l-2 0 s1 2 3 4 z")
    assert p["endpoint"] == (1, 1)
    assert p["per_cmd"]["S"] == 1


def test_svg_path_arc_flags_unspaced():
    # the two arc flags are single chars: "01" is two flags
    p = parse_path("M0 0A5 5 0 01 10 0")
    assert p["per_cmd"]["A"] == 1
    assert p["endpoint"] == (10, 0)


def test_svg_path_multi_subpath():
    p = parse_path("M0 0L5 0ZM10 10L15 10Z")
    assert p["n_subpaths"] == 2


def test_svg_path_errors():
    with pytest.raises(ValueError, match="moveto"):
        parse_path("L 1 2")
    with pytest.raises(ValueError, match="after Z"):
        parse_path("M 1 2 Z 3")
    with pytest.raises(ValueError, match="trailing junk"):
        parse_path("M 1 2 X")
    with pytest.raises(ValueError, match="arc flag"):
        parse_path("M0 0A5 5 0 2 0 10 0")


def test_svg_census():
    svg = build_svg(
        width=64, height=48,
        rects=[(0, 0, 10, 10), (5, 5, 2, 2)],
        circles=[(3, 3, 2)],
        paths=["M0 0 10 0 10 10Z", "M1 1h2v2z"],
        grouped=True,
    )
    out = census_svg(svg)
    assert out["counts"]["rect"] == 2
    assert out["counts"]["circle"] == 1
    assert out["counts"]["g"] == 1
    assert out["path_commands"] == 8
    assert out["path_subpaths"] == 2


def test_svg_viewbox_mismatch_refused():
    bad = (
        b'<svg xmlns="http://www.w3.org/2000/svg" width="10"'
        b' height="10" viewBox="0 0 20 20"/>'
    )
    with pytest.raises(ValueError, match="viewBox"):
        census_svg(bad)


# --------------------------------------------------------------- markdown

from tectonic_spark.operators.markdown import (  # noqa: E402
    build_markdown,
    parse_markdown,
)


def test_markdown_census_full():
    md = build_markdown(
        [("alpha", ["one two three", "four `code [x](y)` five"]),
         ("beta", ["> quoted words here"])],
        title="doc 9",
        links=[("a", "u1"), ("b", "u2")],
        code_lines=["x = 1", "y = 2"],
        list_items=["first", "second", "third"],
    )
    out = parse_markdown(md)
    assert out["n_headings"] == 3
    assert out["heading_levels"] == [1, 2, 2]
    assert out["n_fences"] == 1
    assert out["n_code_lines"] == 4  # 2 real + 2 decoys
    assert out["n_list_items"] == 3
    assert out["n_quotes"] == 1
    assert out["n_links"] == 2  # fence decoy + backtick-masked excluded


def test_markdown_fence_masks_structure():
    md = b"```\n# not heading\n- not item\n[x](y)\n```\n# real\n"
    out = parse_markdown(md)
    assert out["n_headings"] == 1
    assert out["n_list_items"] == 0
    assert out["n_links"] == 0
    assert out["n_code_lines"] == 3


def test_markdown_fence_closer_rules():
    # closer must be same char, >= length, nothing else on the line
    out = parse_markdown(b"````\ncode\n```\nstill code\n````\nafter\n")
    assert out["n_code_lines"] == 3
    with pytest.raises(ValueError, match="unterminated"):
        parse_markdown(b"```\n~~~\n")  # tilde cannot close backtick


def test_markdown_images_vs_links():
    out = parse_markdown(b"![alt](img.png) and [text](page)\n")
    assert out["n_images"] == 1
    assert out["n_links"] == 1
    assert out["n_prose_words"] == 3  # "alt and text" survive as prose


def test_markdown_ordered_lists():
    out = parse_markdown(b"1. one\n2) two\n- three\n")
    assert out["n_list_items"] == 3


# -------------------------------------------------------------------- ODS

from tectonic_spark.operators.odf import build_ods, extract_ods  # noqa: E402

ODS_SHEETS = [
    ("data", [[5, 5, 5, "x", "x", 7], [1, 2, 3], ["a", "a", "a", "a"]]),
    ("extra", [[9]]),
]


@pytest.mark.parametrize("compress", [True, False])
def test_ods_roundtrip(compress):
    out = extract_ods(build_ods(ODS_SHEETS, repeat_compress=compress))
    assert out["sheets"] == ODS_SHEETS
    assert (out["n_repeated_cells"] > 0) == compress


def test_ods_type_identity_guards_runs():
    # 5 and 5.0 compare equal in Python but are different cells
    mixed = [("s", [[5, 5.0, 5]])]
    out = extract_ods(build_ods(mixed))
    assert out["sheets"] == mixed
    assert out["n_repeated_cells"] == 0


def test_ods_floats():
    sheets = [("s", [[1.5, 1.5, -2.25]])]
    out = extract_ods(build_ods(sheets))
    assert out["sheets"] == sheets
    assert out["n_repeated_cells"] == 2


def test_ods_mimetype_rule():
    from tectonic_spark.operators.archive import parse_zip

    good = build_ods(ODS_SHEETS)
    deflated = build_zip(
        [(m["name"], m["data"], "deflate") for m in parse_zip(good)]
    )
    with pytest.raises(ValueError, match="stored"):
        extract_ods(deflated)


def test_ods_bad_repeat_refused():
    from tectonic_spark.operators.archive import parse_zip

    good = build_ods([("s", [[3, 3]])])
    members = []
    for m in parse_zip(good):
        body = m["data"]
        if m["name"] == "content.xml":
            body = body.replace(
                b'table:number-columns-repeated="2"',
                b'table:number-columns-repeated="0"',
            )
        members.append(
            (m["name"], body,
             "stored" if m["name"] == "mimetype" else "deflate")
        )
    with pytest.raises(ValueError, match="non-positive repeat"):
        extract_ods(build_zip(members))


def test_ods_unknown_value_type_refused():
    from tectonic_spark.operators.archive import parse_zip

    good = build_ods([("s", [[3]])])
    members = []
    for m in parse_zip(good):
        body = m["data"]
        if m["name"] == "content.xml":
            body = body.replace(b'office:value-type="float"',
                                b'office:value-type="date"')
        members.append(
            (m["name"], body,
             "stored" if m["name"] == "mimetype" else "deflate")
        )
    with pytest.raises(NotImplementedError, match="value-type"):
        extract_ods(build_zip(members))

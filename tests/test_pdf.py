"""PDF tests: COS grammar, xref table + xref stream (Up predictor),
ObjStm, /Prev incremental-update chains, text extraction across the
layout matrix, string-escape round-trips, and the error taxonomy."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.pdf import build_pdf, extract_text, parse_pdf

PAGES = [["alpha beta gamma delta", "second line here"], ["page two text"]]


class TestMatrix:
    @pytest.mark.parametrize("compress", [False, True])
    @pytest.mark.parametrize("xref_stream", [False, True])
    @pytest.mark.parametrize("tj", [False, True])
    def test_layout_matrix(self, compress, xref_stream, tj):
        pdf = build_pdf(
            PAGES, compress=compress, xref_stream=xref_stream,
            use_tj_array=tj, title="T",
        )
        info = parse_pdf(pdf)
        assert info["n_pages"] == 2
        assert info["title"] == "T"
        assert info["uses_xref_stream"] == xref_stream
        assert extract_text(pdf) == [
            "alpha beta gamma delta\nsecond line here",
            "page two text",
        ]

    def test_objstm(self):
        pdf = build_pdf(PAGES, compress=True, xref_stream=True, objstm=True)
        info = parse_pdf(pdf)
        # catalog + pages + font + 2 page dicts packed (no /Info here)
        assert info["n_compressed_objects"] == 5
        assert extract_text(pdf)[1] == "page two text"

    def test_objstm_requires_xref_stream(self):
        with pytest.raises(ValueError, match="xref_stream"):
            build_pdf(PAGES, objstm=True)

    def test_string_escapes(self):
        tricky = ["parens (nested (deep)) here", "back\\slash", "mix )( \\) done"]
        pdf = build_pdf([tricky])
        assert extract_text(pdf) == ["\n".join(tricky)]

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=0x20, max_codepoint=0xFF,
                ),
                min_size=1,
                max_size=60,
            ).filter(lambda s: s.strip() == s and "\x7f" not in s),
            min_size=1,
            max_size=4,
        ),
        st.booleans(),
        st.booleans(),
    )
    def test_roundtrip_property(self, lines, compress, xref_stream):
        pdf = build_pdf([lines], compress=compress, xref_stream=xref_stream)
        assert extract_text(pdf) == ["\n".join(lines)]


class TestIncrementalUpdate:
    def test_prev_chain(self):
        """An appended update whose xref only covers the new object and
        chains to the original via /Prev — the incremental-save layout."""
        base = build_pdf(PAGES, title="orig")
        orig_startxref = int(
            base[base.rfind(b"startxref") + 9 :].split(b"%%EOF")[0].strip()
        )
        # replace the /Info object (highest numbered object in the base:
        # 1 catalog, 2 pages, 3 font, 4..7 page/content pairs, 8 info)
        info_num = 8
        new_obj = b"<< /Title (updated) /Producer (t) >>"
        out = bytearray(base)
        obj_off = len(out)
        out += f"{info_num} 0 obj\n".encode() + new_obj + b"\nendobj\n"
        xref_off = len(out)
        out += (
            b"xref\n" + f"{info_num} 1\n".encode()
            + f"{obj_off:010d} 00000 n \n".encode()
            + b"trailer\n<< /Size 9 /Root 1 0 R /Info "
            + str(info_num).encode() + b" 0 R /Prev "
            + str(orig_startxref).encode() + b" >>\nstartxref\n"
            + str(xref_off).encode() + b"\n%%EOF\n"
        )
        info = parse_pdf(bytes(out))
        assert info["title"] == "updated"  # the newer xref wins
        assert info["n_pages"] == 2  # older objects still resolve via /Prev
        assert extract_text(bytes(out))[0].startswith("alpha beta")


class TestErrors:
    def test_not_a_pdf(self):
        with pytest.raises(ValueError, match="%PDF"):
            parse_pdf(b"hello world")

    def test_missing_startxref(self):
        pdf = build_pdf(PAGES)
        with pytest.raises(EOFError, match="startxref"):
            parse_pdf(pdf[: pdf.rfind(b"startxref")])

    def test_truncated_stream(self):
        pdf = build_pdf(PAGES, compress=True)
        cut = pdf[: pdf.find(b"endstream") - 5]
        with pytest.raises((EOFError, ValueError)):
            parse_pdf(cut + pdf[pdf.rfind(b"xref") :])

    def test_corrupt_flate(self):
        pdf = bytearray(build_pdf(PAGES, compress=True))
        i = pdf.find(b"stream\n") + 7
        pdf[i : i + 4] = b"\x00\x00\x00\x00"
        with pytest.raises(ValueError, match="FlateDecode"):
            extract_text(bytes(pdf))

    def test_encrypted_refused(self):
        pdf = build_pdf(PAGES)
        out = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 3 0 R")
        with pytest.raises(NotImplementedError, match="encrypted"):
            parse_pdf(out)

    def test_unknown_filter_refused(self):
        # same-length name swap keeps the classic xref byte offsets valid
        pdf = build_pdf(PAGES, compress=True)
        out = pdf.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode  ", 1)
        with pytest.raises(NotImplementedError, match="DCTDecode"):
            extract_text(out)

    def test_bad_startxref_offset(self):
        pdf = bytearray(build_pdf(PAGES))
        i = pdf.rfind(b"startxref")
        j = pdf.find(b"\n", i + 10)
        pdf[i + 10 : j] = b"999999999"
        with pytest.raises(EOFError, match="startxref"):
            parse_pdf(bytes(pdf))


class TestCensus:
    def test_filter_census(self):
        pdf = build_pdf(PAGES, compress=True, xref_stream=True)
        info = parse_pdf(pdf)
        # 2 compressed content streams + the xref stream itself
        assert info["filters"] == {"/FlateDecode": 3}
        assert info["n_streams"] == 3

    def test_version(self):
        assert parse_pdf(build_pdf(PAGES))["version"] == "1.7"

    def test_empty_page(self):
        pdf = build_pdf([["only"], []])
        assert extract_text(pdf) == ["only", ""]


class TestAdviceR11:
    def test_classic_xref_bare_cr_entries(self):
        # ISO 32000 permits the 20-byte 'sp cr' form and legacy writers
        # emit 19-byte entries terminated by bare '\r'; the walk must
        # advance entry-by-entry, not jump to a later '\n' (r10 advice)
        pdf = build_pdf(PAGES)
        x = pdf.rfind(b"xref\n")
        tr = pdf.find(b"trailer", x)
        hacked = pdf[:x] + pdf[x:tr].replace(b" \n", b"\r") + pdf[tr:]
        assert extract_text(hacked) == extract_text(pdf)
        info = parse_pdf(hacked)
        assert info["n_pages"] == 2

    def test_classic_xref_sp_cr_entries(self):
        # the full 20-byte ' \r' EOL form
        pdf = build_pdf(PAGES)
        x = pdf.rfind(b"xref\n")
        tr = pdf.find(b"trailer", x)
        hacked = pdf[:x] + pdf[x:tr].replace(b" \n", b" \r") + pdf[tr:]
        assert extract_text(hacked) == extract_text(pdf)

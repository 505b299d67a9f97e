"""WARC ingestion tests: record grammar, gzip framings, HTTP message
parsing (Content-Length + chunked), HTML text extraction, error
taxonomy, and the Hypothesis round-trip sweeps."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.warc import (
    build_http_response,
    build_warc_record,
    html_lang,
    html_page,
    html_to_text,
    main_content,
    parse_http_response,
    parse_warc,
    write_warc,
)


def _shard(texts, gzip_per_record=True, chunked=False):
    recs = []
    for i, t in enumerate(texts):
        page = html_page(t, title=f"doc {i}", lang="en")
        recs.append(
            build_warc_record(
                "response",
                build_http_response(page, chunked=chunked),
                uri=f"https://x.example/doc/{i}",
                content_type="application/http; msgtype=response",
            )
        )
    return write_warc(recs, gzip_per_record=gzip_per_record)


class TestRecordGrammar:
    def test_roundtrip_plain(self):
        rec = build_warc_record("resource", b"hello world", uri="http://a/b")
        (r,) = parse_warc(write_warc([rec], gzip_per_record=False))
        assert r["type"] == "resource"
        assert r["uri"] == "http://a/b"
        assert r["payload"] == b"hello world"
        assert r["content_length"] == 11
        assert r["version"] == "1.0"

    def test_member_per_record_gzip(self):
        recs = [
            build_warc_record("resource", bytes([i]) * (10 + i)) for i in range(7)
        ]
        data = write_warc(recs)
        # member-per-record: 7 independent gzip magics in the stream
        assert data[:2] == b"\x1f\x8b"
        parsed = parse_warc(data)
        assert [r["payload"] for r in parsed] == [bytes([i]) * (10 + i) for i in range(7)]

    def test_whole_file_gzip(self):
        plain = _shard(["alpha beta"], gzip_per_record=False)
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        whole = co.compress(plain) + co.flush()
        (r,) = parse_warc(whole)
        assert r["type"] == "response"

    def test_multi_record_member(self):
        # one gzip member carrying two records still parses
        plain = _shard(["a b", "c d"], gzip_per_record=False)
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        assert len(parse_warc(co.compress(plain) + co.flush())) == 2

    def test_lws_continuation_folding(self):
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: metadata\r\n"
            b"X-Long: first part\r\n\t second part\r\n"
            b"Content-Length: 2\r\n"
            b"\r\nok\r\n\r\n"
        )
        (r,) = parse_warc(rec)
        assert r["payload"] == b"ok"

    def test_warc_11_version(self):
        rec = build_warc_record("resource", b"x", version="1.1")
        assert parse_warc(rec)[0]["version"] == "1.1"

    def test_inter_record_padding_tolerated(self):
        a = build_warc_record("resource", b"x")
        assert len(parse_warc(a + b"\r\n\r\n" + a)) == 2


class TestErrorTaxonomy:
    def test_truncated_gzip_member(self):
        with pytest.raises(EOFError, match="gzip"):
            parse_warc(_shard(["hello"])[:-20])

    def test_truncated_header(self):
        plain = _shard(["hello"], gzip_per_record=False)
        with pytest.raises(EOFError):
            parse_warc(plain[:40])

    def test_truncated_payload(self):
        plain = _shard(["hello"], gzip_per_record=False)
        with pytest.raises(EOFError, match="payload"):
            parse_warc(plain[:-30])

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="version line"):
            parse_warc(b"NOT A WARC FILE AT ALL\r\n")

    def test_unsupported_version(self):
        with pytest.raises(ValueError, match="version"):
            parse_warc(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")

    def test_missing_content_length(self):
        with pytest.raises(ValueError, match="Content-Length"):
            parse_warc(b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n\r\n\r\n")

    def test_missing_terminator(self):
        rec = build_warc_record("resource", b"abc")
        broken = rec[:-4] + b"XXXX"
        with pytest.raises(ValueError, match="terminator"):
            parse_warc(broken)

    def test_corrupt_gzip(self):
        data = bytearray(_shard(["hello"]))
        data[12] ^= 0xFF
        with pytest.raises((ValueError, EOFError)):
            parse_warc(bytes(data))


class TestHttp:
    def test_content_length_framing(self):
        msg = build_http_response(b"body bytes", content_type="text/plain")
        r = parse_http_response(msg)
        assert (r["status"], r["chunked"], r["body"]) == (200, False, b"body bytes")
        assert r["content_type"] == "text/plain"

    def test_chunked_framing(self):
        body = bytes(range(256)) * 3
        msg = build_http_response(body, chunked=True, chunk_size=100)
        r = parse_http_response(msg)
        assert r["chunked"] and r["body"] == body

    def test_chunk_extensions_ignored(self):
        msg = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" \
              b"3;ext=1\r\nabc\r\n0\r\n\r\n"
        assert parse_http_response(msg)["body"] == b"abc"

    def test_status_codes(self):
        msg = build_http_response(b"", status=404, reason="Not Found")
        assert parse_http_response(msg)["status"] == 404

    def test_truncated_chunk(self):
        msg = build_http_response(b"x" * 500, chunked=True)
        with pytest.raises(EOFError):
            parse_http_response(msg[:-40])

    def test_bad_chunk_size(self):
        msg = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\n"
        with pytest.raises(ValueError, match="chunk size"):
            parse_http_response(msg)

    def test_malformed_status_line(self):
        with pytest.raises(ValueError, match="status line"):
            parse_http_response(b"HTTP/1.1 junk\r\n\r\n")

    def test_truncated_body(self):
        msg = build_http_response(b"0123456789")
        with pytest.raises(EOFError, match="body"):
            parse_http_response(msg[:-5])


class TestHtml:
    def test_script_style_comment_dropped(self):
        page = html_page("real content here", title="t")
        txt = html_to_text(page)
        assert "real content here" in txt.split("\n")
        for leak in ("javascript", "color", "enable", "served by"):
            assert leak not in txt

    def test_entities(self):
        assert html_to_text(b"<p>a &amp; b &lt;c&gt; &#65;&#x42;</p>") == "a & b <c> AB"

    def test_unknown_named_ref_survives(self):
        assert html_to_text(b"&copy; 2024") == "&copy; 2024"

    def test_bad_numeric_ref_survives(self):
        assert html_to_text(b"&#xD800; &#0;") == "&#xD800; &#0;"

    def test_block_semantics(self):
        # </p><p> = two breaks -> blank line; a lone </p> = one break
        txt = html_to_text(b"<p>one</p><p>two</p><span>x</span> y")
        assert txt == "one\n\ntwo\nx y"

    def test_nbsp_and_whitespace_collapse(self):
        # source newlines are flow whitespace; the lone <p> is one break
        assert html_to_text(b"a&nbsp;&nbsp;b   c\n\n\n<p>d</p>") == "a b c\nd"

    def test_main_content_slice(self):
        page = html_page("the body", title="ttl")
        inner = main_content(page)
        assert html_to_text(inner) == "the body"
        assert main_content(b"<p>no main</p>") == b"<p>no main</p>"

    def test_html_lang(self):
        assert html_lang(html_page("x", lang="zh")) == "zh"
        assert html_lang(b"<html><body>x</body></html>") is None

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=200,
        )
    )
    def test_roundtrip_property(self, text):
        """Any text survives the page wrapper: escaped into the <p>,
        extracted back verbatim modulo whitespace normalization."""
        norm = " ".join(text.split())
        page = html_page(text, title="t & u", lang="fr")
        lines = html_to_text(main_content(page)).split("\n")
        if norm:
            assert lines == [norm]
        else:
            assert lines == [""]


class TestFullStack:
    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
                min_size=1,
                max_size=120,
            ),
            min_size=1,
            max_size=6,
        ),
        st.booleans(),
        st.booleans(),
    )
    def test_warc_http_html_roundtrip(self, texts, gz, chunked):
        data = _shard(texts, gzip_per_record=gz, chunked=chunked)
        recs = parse_warc(data)
        assert len(recs) == len(texts)
        for rec, text in zip(recs, texts):
            http = parse_http_response(rec["payload"])
            assert http["status"] == 200
            assert http["chunked"] == chunked
            got = html_to_text(main_content(http["body"]))
            assert got == " ".join(text.split())


class TestAdviceR11:
    def test_malformed_hashref_survives_verbatim(self):
        # '&#ab;' must not reach the decimal int() parse (r10 advice):
        # one malformed entity in crawl HTML must not kill the shard task
        assert html_to_text(b"<p>a &#ab; b</p>") == "a &#ab; b"
        assert html_to_text(b"&#xZZ; &#; &#x;") == "&#xZZ; &#; &#x;"
        # the split regex branches still decode both numeric forms
        assert html_to_text(b"&#65;&#x42;&#X43;") == "ABC"

    def test_default_record_id_is_process_stable(self):
        # built-in hash() is PYTHONHASHSEED-randomized; the default id
        # must be a stable digest so concurrent fixture builders
        # converge on identical shard bytes (pinned value = sha256)
        rec = build_warc_record("response", b"x", uri="https://e/1")
        import hashlib

        want = hashlib.sha256(
            repr(("response", "https://e/1", "2024-01-01T00:00:00Z")).encode()
        ).hexdigest()[:32]
        assert f"<urn:uuid:{want}>".encode() in rec


class TestContentEncoding:
    def test_gzip_roundtrip(self):
        body = b"<p>hello compressed world</p>" * 10
        for ce in ("gzip", "x-gzip"):
            msg = build_http_response(body, content_encoding=ce)
            got = parse_http_response(msg)
            assert got["body"] == body
            assert got["ce_decoded"] is True
            assert got["content_encoding"] == ce

    def test_deflate_zlib_form(self):
        body = b"deflate body " * 40
        msg = build_http_response(body, content_encoding="deflate")
        got = parse_http_response(msg)
        assert got["body"] == body and got["ce_decoded"]

    def test_deflate_raw_server_bug(self):
        # many legacy servers send RAW deflate despite RFC 9110's zlib
        # framing — the parser must fall back
        body = b"raw deflate payload " * 30
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        raw = co.compress(body) + co.flush()
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n"
            b"Content-Length: " + str(len(raw)).encode() + b"\r\n\r\n" + raw
        )
        got = parse_http_response(msg)
        assert got["body"] == body and got["ce_decoded"]

    def test_chunked_plus_gzip_layering(self):
        # CE applies to the representation, TE to the transfer: the
        # parser must de-chunk BEFORE it inflates
        body = b"layered " * 100
        msg = build_http_response(body, chunked=True, content_encoding="gzip")
        got = parse_http_response(msg)
        assert got["body"] == body and got["chunked"] and got["ce_decoded"]

    def test_br_decodes_all_encoder_modes(self):
        # r12: the br lane decodes through the vendored RFC 7932
        # decoder (brotli.py) — round trip for every fixture lane
        body = b"<html><body>" + b"<p>brotli body</p>" * 40 + b"</body>"
        for lane in ("br:lz", "br:literals", "br:uncompressed"):
            msg = build_http_response(body, content_encoding=lane)
            got = parse_http_response(msg)
            assert got["body"] == body
            assert got["ce_decoded"] is True
            assert got["content_encoding"] == "br"  # wire header is plain

    def test_br_chunked_plus_brotli_layering(self):
        body = b"layered brotli " * 64
        msg = build_http_response(body, chunked=True, content_encoding="br")
        got = parse_http_response(msg)
        assert got["body"] == body and got["chunked"] and got["ce_decoded"]

    def test_br_dictionary_reference_decodes(self):
        # r13: the Appendix-A dictionary is vendored — a stream whose
        # copy reaches into the static dictionary now DECODES
        from tectonic_spark.operators.brotli import (
            _dictionary,
            dictionary_ref_stream,
        )

        blob = dictionary_ref_stream()
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
            b"Content-Length: " + str(len(blob)).encode() + b"\r\n\r\n" + blob
        )
        got = parse_http_response(msg)
        assert got["body"] == b"x" + _dictionary()[998 * 4 : 999 * 4]
        assert got["ce_decoded"] is True
        assert got["content_encoding"] == "br"

    def test_br_dict_mode_body_decodes(self):
        # a body encoded with real dictionary references (transforms
        # 0 and 9) through the fixture encoder's dict lane
        from tectonic_spark.operators.brotli import compress

        body = (
            b"The information available from the university is "
            b"different from the public development."
        )
        blob = compress(body, mode="dict")
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
            b"Content-Length: " + str(len(blob)).encode() + b"\r\n\r\n" + blob
        )
        got = parse_http_response(msg)
        assert got["body"] == body
        assert got["ce_decoded"] is True

    def test_br_bomb_censused_not_materialized(self, monkeypatch):
        # the ADVICE r12 cap: a small hostile stream that would expand
        # past _MAX_DECODED_BODY is censused, never materialized
        import tectonic_spark.operators.warc as warc_mod
        from tectonic_spark.operators.brotli import compress

        monkeypatch.setattr(warc_mod, "_MAX_DECODED_BODY", 1 << 10)
        blob = compress(b"A" * (1 << 14), mode="lz")  # tiny stream, 16 KiB out
        assert len(blob) < 200
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
            b"Content-Length: " + str(len(blob)).encode() + b"\r\n\r\n" + blob
        )
        got = parse_http_response(msg)
        assert got["body"] == blob  # untouched opaque bytes
        assert got["ce_decoded"] is False

    def test_gzip_bomb_censused_not_materialized(self, monkeypatch):
        import zlib

        import tectonic_spark.operators.warc as warc_mod

        monkeypatch.setattr(warc_mod, "_MAX_DECODED_BODY", 1 << 10)
        gz = zlib.compressobj(9, zlib.DEFLATED, 31)
        blob = gz.compress(b"A" * (1 << 14)) + gz.flush()
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
            b"Content-Length: " + str(len(blob)).encode() + b"\r\n\r\n" + blob
        )
        got = parse_http_response(msg)
        assert got["body"] == blob
        assert got["ce_decoded"] is False

    def test_br_corrupt_stream_raises(self):
        # structural corruption is a loud raise (the gzip doctrine),
        # distinct from the censused dictionary boundary
        blob = b"\x00\x01\x02brotli-ish"
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n"
            b"Content-Length: " + str(len(blob)).encode() + b"\r\n\r\n" + blob
        )
        with pytest.raises((ValueError, EOFError)):
            parse_http_response(msg)

    def test_truncated_gzip_raises_eof(self):
        body = b"x" * 500
        msg = build_http_response(body, content_encoding="gzip")
        # chop the tail of the gzip stream but keep header block valid
        cut = msg[:-10].replace(
            b"Content-Length: " + str(len(msg) - msg.find(b"\r\n\r\n") - 4).encode(),
            b"Content-Length: " + str(len(msg) - msg.find(b"\r\n\r\n") - 14).encode(),
        )
        with pytest.raises(EOFError, match="gzip"):
            parse_http_response(cut)

    def test_corrupt_gzip_raises_value(self):
        blob = b"\x1f\x8b\xff\xffgarbage"
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
            b"Content-Length: " + str(len(blob)).encode() + b"\r\n\r\n" + blob
        )
        with pytest.raises(ValueError, match="gzip"):
            parse_http_response(msg)


class TestCharsetSniff:
    def test_header_param_wins(self):
        from tectonic_spark.operators.warc import sniff_charset

        codec, origin = sniff_charset(
            "text/html; charset=ISO-8859-1", b"<html>plain</html>"
        )
        assert codec == "cp1252" and origin == "header"  # WHATWG alias

    def test_meta_charset(self):
        from tectonic_spark.operators.warc import sniff_charset

        body = b'<html><head><meta charset="Shift_JIS"></head>x</html>'
        codec, origin = sniff_charset("text/html", body)
        assert codec == "shift_jis" and origin == "meta"

    def test_http_equiv(self):
        from tectonic_spark.operators.warc import sniff_charset

        body = (
            b'<html><head><meta http-equiv="Content-Type" '
            b'content="text/html; charset=gb2312"></head>x</html>'
        )
        codec, origin = sniff_charset(None, body)
        assert codec == "gbk" and origin == "meta"  # WHATWG: gb2312 -> GBK

    def test_meta_outside_first_1024_ignored(self):
        from tectonic_spark.operators.warc import sniff_charset

        body = b"<html>" + b" " * 1100 + b'<meta charset="shift_jis">x'
        codec, origin = sniff_charset(None, body)
        assert codec == "utf-8" and origin == "default"

    def test_bom_overrides_declaration(self):
        from tectonic_spark.operators.warc import decode_page, sniff_charset

        body = "﻿bom text".encode("utf-8")
        codec, origin = sniff_charset("text/html; charset=shift_jis", body)
        assert origin == "bom"
        text, codec, origin = decode_page(body, None)
        assert text == "bom text"  # BOM consumed, not leaked into text
        body16 = "utf16 page".encode("utf-16")  # writes a BOM
        text, codec, origin = decode_page(body16, None)
        assert text == "utf16 page" and origin == "bom"

    def test_unknown_label_censused(self):
        from tectonic_spark.operators.warc import sniff_charset

        codec, origin = sniff_charset("text/html; charset=x-no-such", b"x")
        assert codec == "utf-8" and origin == "unresolved:x-no-such"

    def test_page_roundtrip_cp1252(self):
        page = html_page(
            "café costs £9½", charset="windows-1252",
            declare="none",
        )
        from tectonic_spark.operators.warc import decode_page

        text, codec, origin = decode_page(page, "text/html; charset=windows-1252")
        assert codec == "cp1252" and origin == "header"
        assert "café costs £9½" in html_to_text(text.encode("utf-8"))

    def test_page_roundtrip_shift_jis_meta(self):
        page = html_page(
            "日本語 text", charset="shift_jis", declare="meta",
        )
        from tectonic_spark.operators.warc import decode_page

        text, codec, origin = decode_page(page, "text/html")
        assert codec == "shift_jis" and origin == "meta"
        assert "日本語 text" in html_to_text(text.encode("utf-8"))

    def test_probe_paragraph_is_own_block(self):
        page = html_page("body text here", probe="pröbe ✓")
        txt = html_to_text(main_content(page))
        assert txt == "body text here\n\npröbe ✓"


class TestHtmlTitle:
    def test_title_extracted(self):
        from tectonic_spark.operators.warc import html_title

        page = html_page("body", title="Doc & <Friends>", lang="en")
        assert html_title(page) == "Doc & <Friends>"

    def test_no_title(self):
        from tectonic_spark.operators.warc import html_title

        assert html_title(b"<html><body>x</body></html>") is None

    def test_whitespace_collapsed(self):
        from tectonic_spark.operators.warc import html_title

        assert html_title(b"<title>  a \n  b  </title>") == "a b"

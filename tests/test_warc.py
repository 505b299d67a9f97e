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

"""Structural XML parser tests: grammar matrix, entity handling, XXE
impossibility, sitemap shapes, taxonomy, Hypothesis round-trip."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.xmlparse import (
    build_sitemap,
    build_sitemap_index,
    parse_xml,
)


class TestGrammar:
    def test_tree_shape(self):
        r = parse_xml(b"<a x='1'><b>t1</b><b y=\"2\">t2</b><c/></a>")
        assert r.tag == "a" and r.attrs == {"x": "1"}
        assert [c.tag for c in r.children] == ["b", "b", "c"]
        assert [b.text for b in r.findall("b")] == ["t1", "t2"]
        assert r.find("c").children == []

    def test_entities(self):
        r = parse_xml(b"<r a='&lt;&amp;&gt;'>x &apos;&quot; &#65;&#x42;</r>")
        assert r.attrs["a"] == "<&>"
        assert r.text == "x '\" AB"

    def test_cdata_verbatim(self):
        r = parse_xml(b"<r><![CDATA[<not a tag> &amp; raw]]></r>")
        assert r.text == "<not a tag> &amp; raw"

    def test_comments_and_pi_skipped(self):
        r = parse_xml(b"<?xml version='1.0'?><r><!-- <fake> -->ok</r>")
        assert r.text == "ok" and r.children == []

    def test_doctype_skipped_no_expansion(self):
        # the XXE shape: DOCTYPE declares an entity, the body references
        # it — the declaration is skipped and the reference REFUSED
        doc = b"<!DOCTYPE r [<!ENTITY xxe SYSTEM 'file:///etc/passwd'>]><r>&xxe;</r>"
        with pytest.raises(ValueError, match="no DTD expansion"):
            parse_xml(doc)
        # a DOCTYPE without body references parses fine
        assert parse_xml(b"<!DOCTYPE r [<!ENTITY x 'y'>]><r>ok</r>").text == "ok"

    def test_namespace_prefixes_preserved(self):
        r = parse_xml(b"<ns:a xmlns:ns='http://x'><ns:b/></ns:a>")
        assert r.tag == "ns:a" and r.find("ns:b") is not None

    def test_deep_nesting(self):
        doc = b"<a>" * 200 + b"</a>" * 200
        el = parse_xml(doc)
        depth = 0
        while el.children:
            el = el.children[0]
            depth += 1
        assert depth == 199

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
                min_size=1,
                max_size=30,
            ).filter(lambda s: s.strip() == s and s.strip()),
            min_size=1,
            max_size=5,
        )
    )
    def test_text_roundtrip_property(self, texts):
        def esc(s):
            return (
                s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            )

        doc = "<r>" + "".join(f"<i>{esc(t)}</i>" for t in texts) + "</r>"
        r = parse_xml(doc.encode("utf-8"))
        # parser collapses/strips pure-whitespace runs at element edges
        assert [i.text for i in r.findall("i")] == [
            " ".join(t.split()) if t.split() else "" for t in
            [t for t in texts]
        ] or [i.text for i in r.findall("i")] == [t.strip() for t in texts]


class TestSitemaps:
    def test_leaf(self):
        sm = build_sitemap(
            [
                {"loc": "https://h.example/1?a=1&b=2", "priority": "0.7",
                 "lastmod": "2024-03-01", "changefreq": "daily"},
                {"loc": "https://h.example/2"},
            ]
        )
        r = parse_xml(sm)
        assert r.tag == "urlset"
        u0, u1 = r.findall("url")
        assert u0.child_text("loc") == "https://h.example/1?a=1&b=2"
        assert u0.child_text("priority") == "0.7"
        assert u1.child_text("lastmod") is None

    def test_index(self):
        idx = parse_xml(build_sitemap_index([f"https://h/s{i}.xml" for i in range(3)]))
        assert idx.tag == "sitemapindex"
        assert [s.child_text("loc") for s in idx.findall("sitemap")] == [
            "https://h/s0.xml", "https://h/s1.xml", "https://h/s2.xml",
        ]


class TestErrors:
    @pytest.mark.parametrize(
        "doc,exc,pat",
        [
            (b"<a><b></a>", ValueError, "mismatched"),
            (b"<a>", EOFError, "unclosed"),
            (b"<a></a><b></b>", ValueError, "multiple root"),
            (b"<a x=1></a>", ValueError, "unquoted"),
            (b"<a x='1' x='2'></a>", ValueError, "duplicate attribute"),
            (b"<!-- never ends", EOFError, "comment"),
            (b"<a><![CDATA[open", EOFError, "CDATA"),
            (b"just text", ValueError, "outside the root"),
            (b"", ValueError, "no root"),
            (b"<a>&undefined;</a>", ValueError, "undefined entity"),
            (b"<a>&#xD800;</a>", ValueError, "invalid character"),
            (b"</a>", ValueError, "no open element"),
            (b"<a b></a>", ValueError, "missing '='"),
            (b"<a b='x", EOFError, "unterminated attribute"),
        ],
    )
    def test_taxonomy(self, doc, exc, pat):
        with pytest.raises(exc, match=pat):
            parse_xml(doc)


class TestFeeds:
    def test_rss(self):
        from tectonic_spark.operators.xmlparse import build_rss

        r = parse_xml(
            build_rss(
                "c & d",
                [
                    {"title": "t1", "link": "https://x/1", "guid": "g1",
                     "pubDate": "2024-01-01"},
                    {"title": "t2", "link": "https://x/2"},
                ],
            )
        )
        assert r.tag == "rss" and r.attrs["version"] == "2.0"
        ch = r.find("channel")
        assert ch.child_text("title") == "c & d"
        items = ch.findall("item")
        assert [i.child_text("link") for i in items] == ["https://x/1", "https://x/2"]
        assert items[1].child_text("pubDate") is None

    def test_atom_link_attribute(self):
        from tectonic_spark.operators.xmlparse import build_atom

        a = parse_xml(
            build_atom(
                "f",
                [{"title": "t", "link": "https://x/2?a=1&b=2", "id": "i",
                  "updated": "2024-02-03T00:00:00Z"}],
            )
        )
        assert a.tag == "feed"
        e = a.find("entry")
        assert e.find("link").attrs == {"href": "https://x/2?a=1&b=2",
                                        "rel": "alternate"}
        assert e.child_text("updated") == "2024-02-03T00:00:00Z"

"""Structured-data extraction from web pages — the schema.org layer
(JSON-LD, HTML microdata, OpenGraph) that powers search snippets and is
the highest-signal metadata a crawl pipeline can pull from a page.
Implemented from the public specs: W3C JSON-LD (as embedded
``<script type="application/ld+json">`` blocks), the WHATWG HTML
microdata model (``itemscope``/``itemtype``/``itemprop`` with the
nearest-ancestor-scope property assignment and nested-item values), and
the OpenGraph protocol (``<meta property="og:*">``).

* **Writer** (``build_page``): a deterministic XHTML page embedding ONE
  of the three syntaxes — the same logical item (type, headline,
  author, word count) expressed three ways, so extraction must
  normalize across syntaxes.
* **Extractor** (``extract_structured``): sniffs what is actually
  present (never trusts a lane hint): JSON-LD scripts are parsed with
  the stdlib JSON parser, microdata by the spec's tree algorithm
  (items = elements with ``itemscope``; properties attach to the
  NEAREST ancestor item; an ``itemprop`` element that is itself
  ``itemscope`` contributes a nested item; ``<meta>`` carries its
  value in ``content``), OpenGraph from ``meta property/content``
  pairs.  Returns normalized ``{syntax, sd_type, headline, author,
  word_count}``.

Error taxonomy: ``ValueError`` structural (malformed JSON-LD, an
``itemprop`` outside any ``itemscope``, missing og required tags),
``EOFError`` via the XML layer on truncation.

Reference framing: beyond-reference crawl-analysis surface (the
reference engine has no HTML/metadata layer); rides xmlparse.py.
"""

from __future__ import annotations

import json

from tectonic_spark.operators.ooxml import _attr, _resolve
from tectonic_spark.operators.xmlparse import Element, parse_xml

__all__ = ["build_page", "extract_structured"]

XHTML_NS = "http://www.w3.org/1999/xhtml"
SCHEMA = "https://schema.org"


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


# ------------------------------------------------------------------ writer


def build_page(
    *,
    syntax: str,
    headline: str,
    author: str,
    word_count: int,
    body_words: str = "",
) -> bytes:
    """One XHTML page carrying an Article item in the given ``syntax``
    (``jsonld`` / ``microdata`` / ``og``)."""
    if syntax == "jsonld":
        obj = {
            "@context": SCHEMA,
            "@type": "Article",
            "headline": headline,
            "wordCount": word_count,
            "author": {"@type": "Person", "name": author},
        }
        block = (
            '<script type="application/ld+json">'
            + _esc(json.dumps(obj, sort_keys=True))
            + "</script>"
        )
        head_meta = ""
    elif syntax == "microdata":
        block = (
            f'<div itemscope="" itemtype="{SCHEMA}/Article">'
            f'<span itemprop="headline">{_esc(headline)}</span>'
            f'<meta itemprop="wordCount" content="{word_count}"/>'
            f'<span itemprop="author" itemscope=""'
            f' itemtype="{SCHEMA}/Person">'
            f'<span itemprop="name">{_esc(author)}</span></span></div>'
        )
        head_meta = ""
    elif syntax == "og":
        head_meta = (
            f'<meta property="og:title" content="{_esc(headline)}"/>'
            '<meta property="og:type" content="article"/>'
            f'<meta property="article:author" content="{_esc(author)}"/>'
            f'<meta property="article:word_count"'
            f' content="{word_count}"/>'
        )
        block = ""
    else:
        raise ValueError(f"unknown structured-data syntax {syntax!r}")
    body = f"<p>{_esc(body_words)}</p>" if body_words else ""
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<html xmlns="{XHTML_NS}"><head>'
        f"<title>{_esc(headline)}</title>{head_meta}</head>"
        f"<body>{block}{body}</body></html>"
    ).encode()


# --------------------------------------------------------------- extractor


def extract_structured(data: bytes) -> dict:
    """Sniff and extract the page's structured data → normalized
    ``{syntax, sd_type, headline, author, word_count}``."""
    root = parse_xml(data, preserve_space=True)
    u, l, scope = _resolve(root, {})
    if (u, l) != (XHTML_NS, "html"):
        raise ValueError("structured-data: page is not XHTML")

    jsonld_blocks: list[str] = []
    og: dict[str, str] = {}
    micro_items: list[dict] = []

    def walk(el: Element, scope: dict, item: dict | None) -> None:
        eu, el_local, escope = _resolve(el, scope)
        if eu == XHTML_NS and el_local == "script":
            if _attr(el, escope, "", "type") == "application/ld+json":
                jsonld_blocks.append(el.text)
                return
        if eu == XHTML_NS and el_local == "meta":
            prop = _attr(el, escope, "", "property")
            content = _attr(el, escope, "", "content")
            if prop is not None and content is not None:
                og[prop] = content
        here = item
        iprop = _attr(el, escope, "", "itemprop")
        has_scope = _attr(el, escope, "", "itemscope") is not None
        if has_scope:
            new_item = {
                "type": _attr(el, escope, "", "itemtype"),
                "props": {},
            }
            if iprop is not None:
                if item is None:
                    raise ValueError(
                        "structured-data: itemprop item outside any"
                        " itemscope"
                    )
                item["props"].setdefault(iprop, []).append(new_item)
            else:
                micro_items.append(new_item)
            here = new_item
        elif iprop is not None:
            if item is None:
                raise ValueError(
                    "structured-data: itemprop outside any itemscope"
                )
            if eu == XHTML_NS and el_local == "meta":
                value = _attr(el, escope, "", "content")
                if value is None:
                    raise ValueError(
                        "structured-data: meta itemprop without content"
                    )
            else:
                value = _text_of(el)
            item["props"].setdefault(iprop, []).append(value)
        for c in el.children:
            walk(c, escope, here)

    for c in root.children:
        walk(c, scope, None)

    if jsonld_blocks:
        try:
            obj = json.loads(jsonld_blocks[0])
        except json.JSONDecodeError as e:
            raise ValueError(f"structured-data: malformed JSON-LD: {e}")
        if isinstance(obj, list):
            if not obj:
                raise ValueError("structured-data: empty JSON-LD array")
            obj = obj[0]
        author = obj.get("author")
        if isinstance(author, dict):
            author = author.get("name")
        return {
            "syntax": "jsonld",
            "sd_type": obj.get("@type"),
            "headline": obj.get("headline"),
            "author": author,
            "word_count": obj.get("wordCount"),
        }
    if micro_items:
        it = micro_items[0]
        itype = it["type"]
        props = it["props"]

        def first(name):
            vals = props.get(name)
            return vals[0] if vals else None

        author = first("author")
        if isinstance(author, dict):
            author = (author["props"].get("name") or [None])[0]
        wc = first("wordCount")
        return {
            "syntax": "microdata",
            "sd_type": itype.rsplit("/", 1)[-1] if itype else None,
            "headline": first("headline"),
            "author": author,
            "word_count": int(wc) if wc is not None else None,
        }
    if any(k.startswith("og:") for k in og):
        if "og:title" not in og or "og:type" not in og:
            raise ValueError(
                "structured-data: OpenGraph requires og:title and og:type"
            )
        wc = og.get("article:word_count")
        return {
            "syntax": "og",
            "sd_type": og["og:type"].capitalize(),
            "headline": og["og:title"],
            "author": og.get("article:author"),
            "word_count": int(wc) if wc is not None else None,
        }
    raise ValueError("structured-data: page carries no structured data")


def _text_of(el: Element) -> str:
    out = [el.text]
    for c in el.children:
        out.append(_text_of(c))
    return "".join(out)

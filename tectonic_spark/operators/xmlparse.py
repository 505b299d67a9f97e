"""Structural XML parsing — the metadata markup of the crawl ecosystem
(sitemaps, RSS/Atom feeds, OPML). A crawl frontier reads sitemap.xml
before it fetches anything else.

Scope (spec-derivable from the public XML 1.0 grammar):

* Element tree: start/end/self-closing tags, attributes in single or
  double quotes, nested children, mixed text.
* Character data: the five predefined entities (&amp; &lt; &gt;
  &apos; &quot;), numeric references (decimal + hex), CDATA sections,
  comments, processing instructions, DOCTYPE *skip*.
* **No external entities, no DTD expansion — by construction** (the
  XXE class cannot exist here: DOCTYPE internal subsets are skipped
  verbatim and custom entity references are a ``ValueError``).
* Well-formedness: mismatched/unclosed tags, unterminated constructs,
  stray ``<`` are structural errors.

Error taxonomy: ``EOFError`` truncation, ``ValueError`` structural.

Sitemap helpers implement the public sitemaps.org protocol shapes:
``<urlset>`` leaf sitemaps and ``<sitemapindex>`` index files.
"""

from __future__ import annotations

import re

__all__ = [
    "Element",
    "build_atom",
    "build_rss",
    "build_sitemap",
    "build_sitemap_index",
    "parse_xml",
]

_NAME = re.compile(r"[A-Za-z_:][-A-Za-z0-9._:]*")
_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "apos": "'", "quot": '"'}


class Element:
    __slots__ = ("tag", "attrs", "children", "text", "content")

    def __init__(self, tag: str, attrs: dict[str, str]) -> None:
        self.tag = tag
        self.attrs = attrs
        self.children: list[Element] = []
        self.text = ""  # concatenated character data directly under this tag
        # mixed-content view: character data and child Elements in
        # DOCUMENT ORDER (what .text + .children cannot express) —
        # needed by consumers of formats that interleave text with
        # inline markup (ODF text:s/text:tab, XHTML prose)
        self.content: list["Element | str"] = []

    def _add_text(self, chunk: str) -> None:
        self.text += chunk
        if self.content and isinstance(self.content[-1], str):
            self.content[-1] += chunk
        else:
            self.content.append(chunk)

    def find(self, tag: str) -> "Element | None":
        for c in self.children:
            if c.tag == tag:
                return c
        return None

    def findall(self, tag: str) -> list["Element"]:
        return [c for c in self.children if c.tag == tag]

    def child_text(self, tag: str) -> str | None:
        c = self.find(tag)
        return c.text if c is not None else None

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} attrs={self.attrs} kids={len(self.children)}>"


def _decode_text(raw: str, what: str) -> str:
    def deref(m: re.Match) -> str:
        ref = m.group(1)
        if ref.startswith("#x") or ref.startswith("#X"):
            cp = int(ref[2:], 16)
        elif ref.startswith("#"):
            cp = int(ref[1:])
        else:
            if ref not in _ENTITIES:
                raise ValueError(
                    f"{what}: undefined entity &{ref}; (no DTD expansion"
                    " — external/custom entities are refused)"
                )
            return _ENTITIES[ref]
        if not 0 < cp <= 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            raise ValueError(f"{what}: invalid character reference {ref}")
        return chr(cp)

    return re.sub(r"&([^;&\s]{1,10});", deref, raw) if "&" in raw else raw


def parse_xml(data: bytes | str, *, preserve_space: bool = False) -> Element:
    """Parse one well-formed XML document → root :class:`Element`.

    ``preserve_space=True`` keeps character data verbatim (no strip, no
    whitespace-only drop) — the mode document formats whose text nodes
    carry load-bearing whitespace (WordprocessingML ``w:t`` under
    ``xml:space="preserve"``, XHTML prose) opt into.  The default strips,
    which is what the sitemap/feed/metadata consumers expect."""
    s = data.decode("utf-8") if isinstance(data, bytes) else data
    n = len(s)
    pos = 0
    root: Element | None = None
    stack: list[Element] = []

    def text_to(end: int) -> None:
        if stack and pos < end:
            chunk = s[pos:end]
            if preserve_space:
                stack[-1]._add_text(_decode_text(chunk, "text"))
            elif chunk.strip():
                stack[-1]._add_text(_decode_text(chunk, "text").strip())

    while pos < n:
        lt = s.find("<", pos)
        if lt < 0:
            if s[pos:].strip():
                raise ValueError("character data outside the root element")
            break
        text_to(lt)
        pos = lt
        if s.startswith("<!--", pos):
            end = s.find("-->", pos + 4)
            if end < 0:
                raise EOFError("unterminated comment")
            pos = end + 3
            continue
        if s.startswith("<![CDATA[", pos):
            end = s.find("]]>", pos + 9)
            if end < 0:
                raise EOFError("unterminated CDATA section")
            if stack:
                stack[-1]._add_text(s[pos + 9 : end])
            elif s[pos + 9 : end].strip():
                raise ValueError("CDATA outside the root element")
            pos = end + 3
            continue
        if s.startswith("<?", pos):
            end = s.find("?>", pos + 2)
            if end < 0:
                raise EOFError("unterminated processing instruction")
            pos = end + 2
            continue
        if s.startswith("<!DOCTYPE", pos):
            # skip, honoring an internal subset's brackets; no expansion
            depth = 0
            i = pos + 9
            while i < n:
                c = s[i]
                if c == "[":
                    depth += 1
                elif c == "]":
                    depth -= 1
                elif c == ">" and depth <= 0:
                    break
                i += 1
            else:
                raise EOFError("unterminated DOCTYPE")
            pos = i + 1
            continue
        if s.startswith("</", pos):
            m = _NAME.match(s, pos + 2)
            if not m:
                raise ValueError(f"malformed end tag at offset {pos}")
            gt = s.find(">", m.end())
            if gt < 0:
                raise EOFError("unterminated end tag")
            if s[m.end() : gt].strip():
                raise ValueError(f"junk in end tag </{m.group(0)}>")
            if not stack:
                raise ValueError(f"end tag </{m.group(0)}> with no open element")
            open_el = stack.pop()
            if open_el.tag != m.group(0):
                raise ValueError(
                    f"mismatched end tag: <{open_el.tag}> closed by"
                    f" </{m.group(0)}>"
                )
            pos = gt + 1
            continue
        # start / self-closing tag
        m = _NAME.match(s, pos + 1)
        if not m:
            raise ValueError(f"stray '<' at offset {pos}")
        tag = m.group(0)
        i = m.end()
        attrs: dict[str, str] = {}
        while True:
            while i < n and s[i].isspace():
                i += 1
            if i >= n:
                raise EOFError(f"unterminated start tag <{tag}>")
            if s[i] == ">":
                selfclose = False
                i += 1
                break
            if s.startswith("/>", i):
                selfclose = True
                i += 2
                break
            am = _NAME.match(s, i)
            if not am:
                raise ValueError(f"malformed attribute in <{tag}> at offset {i}")
            aname = am.group(0)
            i = am.end()
            while i < n and s[i].isspace():
                i += 1
            if i >= n or s[i] != "=":
                raise ValueError(f"attribute {aname!r} in <{tag}> missing '='")
            i += 1
            while i < n and s[i].isspace():
                i += 1
            if i >= n or s[i] not in "\"'":
                raise ValueError(f"unquoted attribute value for {aname!r}")
            q = s[i]
            end = s.find(q, i + 1)
            if end < 0:
                raise EOFError(f"unterminated attribute value for {aname!r}")
            if aname in attrs:
                raise ValueError(f"duplicate attribute {aname!r} in <{tag}>")
            attrs[aname] = _decode_text(s[i + 1 : end], f"attr {aname}")
            i = end + 1
        el = Element(tag, attrs)
        if stack:
            stack[-1].children.append(el)
            stack[-1].content.append(el)
        elif root is None:
            root = el
        else:
            raise ValueError("multiple root elements")
        if not selfclose:
            stack.append(el)
        pos = i
    if stack:
        raise EOFError(f"unclosed element <{stack[-1].tag}>")
    if root is None:
        raise ValueError("no root element")
    return root


# ---------------------------------------------------------------------------
# sitemaps.org protocol shapes (fixture writers)
# ---------------------------------------------------------------------------


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def build_sitemap(urls: list[dict]) -> bytes:
    """A ``<urlset>`` leaf sitemap; each dict may carry loc (required),
    lastmod, changefreq, priority."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for u in urls:
        parts.append("<url>")
        parts.append(f"<loc>{_esc(u['loc'])}</loc>")
        for k in ("lastmod", "changefreq", "priority"):
            if k in u:
                parts.append(f"<{k}>{_esc(str(u[k]))}</{k}>")
        parts.append("</url>")
    parts.append("</urlset>")
    return "\n".join(parts).encode("utf-8")


def build_sitemap_index(locs: list[str]) -> bytes:
    """A ``<sitemapindex>`` pointing at leaf sitemaps."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for loc in locs:
        parts.append(f"<sitemap><loc>{_esc(loc)}</loc></sitemap>")
    parts.append("</sitemapindex>")
    return "\n".join(parts).encode("utf-8")


def build_rss(channel_title: str, items: list[dict]) -> bytes:
    """An RSS 2.0 feed; items carry title/link/guid/pubDate."""
    parts = ['<?xml version="1.0"?>', '<rss version="2.0"><channel>']
    parts.append(f"<title>{_esc(channel_title)}</title>")
    for it in items:
        parts.append("<item>")
        for k in ("title", "link", "guid", "pubDate"):
            if k in it:
                parts.append(f"<{k}>{_esc(str(it[k]))}</{k}>")
        parts.append("</item>")
    parts.append("</channel></rss>")
    return "\n".join(parts).encode("utf-8")


def build_atom(feed_title: str, entries: list[dict]) -> bytes:
    """An Atom feed; entries carry title/id/updated and link as the
    ATTRIBUTE form (<link href=...>) — the shape RSS lacks."""
    parts = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<feed xmlns="http://www.w3.org/2005/Atom">',
        f"<title>{_esc(feed_title)}</title>",
    ]
    for e in entries:
        parts.append("<entry>")
        parts.append(f"<title>{_esc(e['title'])}</title>")
        parts.append(f'<link href="{_esc(e["link"])}" rel="alternate"/>')
        parts.append(f"<id>{_esc(e['id'])}</id>")
        parts.append(f"<updated>{_esc(e['updated'])}</updated>")
        parts.append("</entry>")
    parts.append("</feed>")
    return "\n".join(parts).encode("utf-8")

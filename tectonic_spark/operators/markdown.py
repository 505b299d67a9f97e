"""Markdown structure census — the de-facto format of code-hosting
and documentation corpora; a training-data pipeline sees more markdown
than any other markup after HTML.  Implemented from the public
CommonMark line grammar subset that structure extraction needs:

* ATX headings (``#``..``######`` + space), with level;
* fenced code blocks (``` / ~~~ with matching-or-longer closers) —
  fences MASK everything inside: a ``# heading`` or ``[link](u)``
  inside a fence is literal text, the thing naive regex censuses get
  wrong;
* list items (``-``/``*``/``+`` + space, and ordered ``1.`` forms);
* block quotes (``>``);
* inline links ``[text](url)`` counted OUTSIDE code (fenced blocks
  and backtick spans both mask), with image links ``![alt](url)``
  counted separately;
* word count over the prose that remains after structure markers.

``parse_markdown`` is line-based with a fence state machine —
deterministic, no backtracking.

Error taxonomy: ``ValueError`` on an unterminated fence (the census
refuses to guess whether the tail was code).

Reference framing: beyond-reference text-analysis surface (c03
family), pure Python over strings — no XML/ZIP layers.
"""

from __future__ import annotations

import re

__all__ = ["build_markdown", "parse_markdown"]

_ATX = re.compile(r"^(#{1,6}) (.*)$")
_FENCE = re.compile(r"^(`{3,}|~{3,})(.*)$")
_LIST = re.compile(r"^(?:[-*+]|\d{1,9}[.)]) ")
_LINK = re.compile(r"(!?)\[([^\]\n]*)\]\(([^)\n]*)\)")
_CODE_SPAN = re.compile(r"`[^`\n]*`")


def build_markdown(
    sections: list[tuple[str, list[str]]],
    *,
    title: str,
    links: list[tuple[str, str]] = (),
    code_lines: list[str] | None = None,
    list_items: list[str] | None = None,
) -> bytes:
    """Deterministic markdown: an H1 title, H2 sections with their
    prose lines, an optional link paragraph, an optional fenced code
    block (whose content includes markdown-looking DECOYS the parser
    must not count), an optional bullet list."""
    out = [f"# {title}", ""]
    for name, lines in sections:
        out.append(f"## {name}")
        out.extend(lines)
        out.append("")
    if links:
        out.append(" ".join(f"[{t}]({u})" for t, u in links))
        out.append("")
    if code_lines is not None:
        out.append("```python")
        out.extend(code_lines)
        out.append("# not a heading")
        out.append("[not a link](nope)")
        out.append("```")
        out.append("")
    if list_items is not None:
        out.extend(f"- {it}" for it in list_items)
        out.append("")
    return "\n".join(out).encode()


def parse_markdown(data: bytes) -> dict:
    """Line-grammar census → ``{n_headings, heading_levels, n_fences,
    n_code_lines, n_list_items, n_quotes, n_links, n_images,
    n_prose_words}``."""
    text = data.decode("utf-8")
    in_fence = False
    fence_marker = ""
    n_headings = 0
    heading_levels: list[int] = []
    n_fences = 0
    n_code_lines = 0
    n_list_items = 0
    n_quotes = 0
    n_links = 0
    n_images = 0
    n_prose_words = 0
    for line in text.split("\n"):
        if in_fence:
            fm = _FENCE.match(line)
            if (
                fm
                and fm.group(1)[0] == fence_marker[0]
                and len(fm.group(1)) >= len(fence_marker)
                and not fm.group(2).strip()
            ):
                in_fence = False
            else:
                n_code_lines += 1
            continue
        fm = _FENCE.match(line)
        if fm:
            in_fence = True
            fence_marker = fm.group(1)
            n_fences += 1
            continue
        hm = _ATX.match(line)
        if hm:
            n_headings += 1
            heading_levels.append(len(hm.group(1)))
            rest = hm.group(2)
        elif _LIST.match(line):
            n_list_items += 1
            rest = _LIST.sub("", line, count=1)
        elif line.startswith(">"):
            n_quotes += 1
            rest = line[1:].lstrip()
        else:
            rest = line
        # inline: backtick code spans mask links inside them
        rest = _CODE_SPAN.sub(" ", rest)

        def count_link(m: re.Match) -> str:
            nonlocal n_links, n_images
            if m.group(1):
                n_images += 1
            else:
                n_links += 1
            return m.group(2)  # link text stays prose

        rest = _LINK.sub(count_link, rest)
        n_prose_words += len(rest.split())
    if in_fence:
        raise ValueError("markdown: unterminated code fence")
    return {
        "n_headings": n_headings,
        "heading_levels": heading_levels,
        "n_fences": n_fences,
        "n_code_lines": n_code_lines,
        "n_list_items": n_list_items,
        "n_quotes": n_quotes,
        "n_links": n_links,
        "n_images": n_images,
        "n_prose_words": n_prose_words,
    }

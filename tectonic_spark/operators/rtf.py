"""RTF (Rich Text Format) codec — the legacy word-processing format
still abundant in older crawls, mail attachments and government
document dumps; a text-extraction target every training-data pipeline
meets.  Implemented from the public Microsoft RTF 1.9.1 specification
grammar (control words, control symbols, groups, destinations).

* **Writer** (``build_rtf``): deterministic fixture documents — the
  ``{\\rtf1\\ansi\\ansicpg1252`` header, font and color tables,
  ``{\\info{\\title …}}`` metadata, paragraphs separated by ``\\par``,
  bold/italic formatting groups, TAB/line controls, the three escaped
  delimiters ``\\\\ \\{ \\}``, 8-bit cp1252 bytes as ``\\'xx`` and
  non-ASCII as ``\\uN`` with a ``?`` fallback governed by ``\\uc``.
* **Extractor** (``extract_rtf``): a real tokenizer over the grammar —
  groups push/pop formatting state (``\\uc`` is GROUP-SCOPED per
  spec), destinations that contribute no document text are skipped
  (``fonttbl`` / ``colortbl`` / ``stylesheet`` and every
  ``{\\*\\…}`` optional destination), ``\\info``'s ``\\title`` is
  captured as metadata, ``\\par``/``\\line`` → NL, ``\\tab`` → TAB,
  ``\\uN`` emits the code point (negative N per the signed-16-bit
  rule) and swallows the next ``\\uc`` fallback items (a ``\\'xx``
  counts as ONE item), ``\\'xx`` decodes through cp1252.

Error taxonomy: ``EOFError`` truncation (unbalanced groups, trailing
backslash), ``ValueError`` structural (not an RTF stream, bad hex
escape, stray ``}``).

Reference framing: beyond-reference crawl-ingestion surface; the
reference engine (tectonic) has no document-format layer.
"""

from __future__ import annotations

__all__ = ["build_rtf", "extract_rtf"]

# Destinations whose content is not document text.  \info is handled
# specially (title capture); every {\*\...} group is skipped generically.
_SKIP_DESTS = {
    "fonttbl",
    "colortbl",
    "stylesheet",
    "generator",
    "pict",
}


def _escape_text(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif ch == "\t":
            out.append("\\tab ")
        elif ch == "\n":
            out.append("\\line ")
        elif o < 0x80:
            out.append(ch)
        elif 0xA0 <= o <= 0xFF:
            out.append("\\'%02x" % o)  # cp1252 upper half maps 1:1 there
        else:
            n = o if o < 0x8000 else o - 0x10000  # signed-16 rule
            out.append("\\u%d?" % n)
    return "".join(out)


def build_rtf(
    paragraphs: list[str],
    *,
    title: str | None = None,
    bold_every: int = 0,
) -> bytes:
    """Serialize an RTF document.  ``paragraphs`` are plain text (may
    contain TAB/NL and non-ASCII); ``bold_every=k`` wraps every k-th
    word of each paragraph in a ``{\\b …}`` group to exercise group
    state."""
    out = [
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1",
        "{\\fonttbl{\\f0\\fswiss Helvetica;}{\\f1\\froman Times;}}",
        "{\\colortbl;\\red0\\green0\\blue0;\\red255\\green0\\blue0;}",
    ]
    if title is not None:
        out.append("{\\info{\\title %s}}" % _escape_text(title))
    out.append("{\\*\\generator tectonic-spark fixtures;}")
    out.append("\\f0\\fs24 ")
    for i, para in enumerate(paragraphs):
        if i:
            out.append("\\par ")
        if bold_every > 0:
            words = para.split(" ")
            chunks = []
            for j, w in enumerate(words):
                t = _escape_text(w)
                chunks.append("{\\b %s}" % t if j % bold_every == bold_every - 1 else t)
            out.append(" ".join(chunks))
        else:
            out.append(_escape_text(para))
    out.append("}")
    return "".join(out).encode("ascii")


def extract_rtf(data: bytes) -> dict:
    """Tokenize an RTF stream → ``{text, title, n_groups, n_controls}``.
    ``text`` joins paragraphs with NL exactly as ``\\par`` breaks them."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("not an RTF stream")
    s = data.decode("latin-1")  # byte-transparent; \'xx handled below
    n = len(s)
    i = 0
    depth = 0
    text: list[str] = []
    title: str | None = None
    n_groups = 0
    n_controls = 0
    # group-scoped state: (uc, dest) — dest is 'doc', 'skip', or 'title'
    uc = 1
    dest = "doc"
    stack: list[tuple[int, str]] = []
    pending_skip = 0  # \uN fallback items left to swallow
    star_pending = False  # just entered a group whose first token may be \*

    def emit(ch: str) -> None:
        nonlocal pending_skip
        if pending_skip > 0:
            pending_skip -= 1
            return
        if dest == "doc":
            text.append(ch)
        elif dest == "title":
            nonlocal title
            title = (title or "") + ch

    while i < n:
        c = s[i]
        if c == "{":
            stack.append((uc, dest))
            depth += 1
            n_groups += 1
            i += 1
            star_pending = True
            pending_skip = 0
            continue
        if c == "}":
            if not stack:
                raise ValueError("stray '}' outside any group")
            uc, dest = stack.pop()
            depth -= 1
            i += 1
            pending_skip = 0
            if depth == 0:
                break  # document group closed; trailing bytes ignored
            continue
        if c == "\\":
            if i + 1 >= n:
                raise EOFError("trailing backslash")
            nc = s[i + 1]
            if nc == "'":
                if i + 4 > n:
                    raise EOFError("truncated \\'xx escape")
                hx = s[i + 2 : i + 4]
                try:
                    b = int(hx, 16)
                except ValueError:
                    raise ValueError(f"bad hex escape \\'{hx}")
                emit(bytes([b]).decode("cp1252", errors="replace"))
                i += 4
                star_pending = False
                continue
            if nc in "\\{}":
                emit(nc)
                i += 2
                star_pending = False
                continue
            if nc == "~":  # non-breaking space control symbol
                emit(" ")
                i += 2
                star_pending = False
                continue
            if nc == "*":
                if star_pending:
                    dest = "skip"  # unknown optional destination
                i += 2
                continue
            if not nc.isalpha():
                # other control symbols contribute nothing
                i += 2
                star_pending = False
                continue
            j = i + 1
            while j < n and s[j].isalpha():
                j += 1
            word = s[i + 1 : j]
            param = None
            if j < n and (s[j] == "-" or s[j].isdigit()):
                k = j + 1 if s[j] == "-" else j
                while k < n and s[k].isdigit():
                    k += 1
                if s[j:k] in ("-", ""):
                    raise ValueError(f"control word \\{word} with bare '-'")
                param = int(s[j:k])
                j = k
            if j < n and s[j] == " ":  # the delimiter space is consumed
                j += 1
            i = j
            n_controls += 1
            star_pending = False
            if word == "par" or word == "line":
                emit("\n")
            elif word == "tab":
                emit("\t")
            elif word == "uc":
                uc = param if param is not None else 1
            elif word == "u":
                if param is None:
                    raise ValueError("\\u without a code point")
                cp = param + 0x10000 if param < 0 else param
                if pending_skip > 0:
                    pending_skip -= 1
                else:
                    if dest == "doc":
                        text.append(chr(cp))
                    elif dest == "title":
                        title = (title or "") + chr(cp)
                    pending_skip = uc
            elif word in _SKIP_DESTS:
                dest = "skip"
            elif word == "info":
                dest = "skip"  # children opt back in (\title)
            elif word == "title":
                if dest != "doc":
                    dest = "title"
            # all other control words: formatting/structure, no text
            continue
        if c in "\r\n":
            i += 1  # raw newlines in the file are NOT document text
            continue
        emit(c)
        star_pending = False
        i += 1
    if depth != 0:
        raise EOFError(f"{depth} unclosed group(s)")
    return {
        "text": "".join(text),
        "title": title,
        "n_groups": n_groups,
        "n_controls": n_controls,
    }

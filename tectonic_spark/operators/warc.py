"""WARC (Web ARChive, ISO 28500) ingestion — the container format of
web-crawl corpora (Common Crawl ships WARC/WET/WAT), i.e. the on-disk
shape of the raw side of a 100 TB training-data pipeline.

Scope (all structural, spec-derivable — no vendored tables):

* **Record grammar** (ISO 28500 §4): ``WARC/1.0|1.1`` version line,
  CRLF-terminated named fields with LWS continuation lines,
  ``Content-Length``-framed payload, two CRLF record terminator.
* **Gzip framing**: Common Crawl's member-per-record layout (each
  record an independent gzip member, members concatenated — the layout
  that lets a reader skip records without inflating them), whole-file
  gzip, and plain WARC all parse through the same walk.
* **HTTP message payloads** (``application/http``): status line +
  headers, body framed by ``Content-Length`` or RFC 9112 chunked
  transfer coding (size-line hex + per-chunk CRLF + 0-chunk trailer).
* **HTML → text extraction**: comment/script/style/noscript removal,
  block-element newline semantics, numeric (dec/hex) and core named
  character references, whitespace normalization. Deliberately
  deterministic so extraction is round-trip-testable against the text
  the fixture embedded.

Error taxonomy matches the codec family: ``EOFError`` for truncation,
``ValueError`` for structural violations.

Reference note: the reference engine (core/fs2/harness Scala) has no
crawl-ingestion surface — this module is north-star training-pipeline
scope, same category as the codec family (SURVEY.md §2 pipeline ops).

100 TB shape: WARC shards are whole-file work units (gzip members are
not byte-range-splittable without a member index); each executor task
walks its own shard via ``binaryFile`` rows inside ``mapInPandas`` —
payload bytes never leave the executor, nothing shuffles until the
extracted text columns.
"""

from __future__ import annotations

import hashlib
import re
import zlib

__all__ = [
    "build_http_response",
    "build_warc_record",
    "html_lang",
    "html_page",
    "html_to_text",
    "main_content",
    "parse_http_response",
    "parse_warc",
    "write_warc",
]

_CRLF = b"\r\n"

# ---------------------------------------------------------------------------
# writer (fixture side — also what a sink would emit)
# ---------------------------------------------------------------------------


def build_warc_record(
    rec_type: str,
    payload: bytes,
    *,
    uri: str | None = None,
    date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/octet-stream",
    record_id: str | None = None,
    version: str = "1.0",
    extra: dict[str, str] | None = None,
) -> bytes:
    """One WARC record: version line, named fields, CRLF, payload,
    CRLFCRLF terminator (ISO 28500 §4)."""
    fields = [
        ("WARC-Type", rec_type),
        ("WARC-Date", date),
        # stable digest, not built-in hash(): str hashing is
        # PYTHONHASHSEED-randomized per process, and fixture shard bytes
        # must be identical across concurrent builder processes
        (
            "WARC-Record-ID",
            record_id
            or "<urn:uuid:%s>"
            % hashlib.sha256(repr((rec_type, uri, date)).encode()).hexdigest()[:32],
        ),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    if uri is not None:
        fields.insert(3, ("WARC-Target-URI", uri))
    for k, v in (extra or {}).items():
        fields.append((k, v))
    head = f"WARC/{version}\r\n".encode()
    head += b"".join(f"{k}: {v}\r\n".encode() for k, v in fields)
    return head + _CRLF + payload + _CRLF + _CRLF


def build_http_response(
    body: bytes,
    *,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
    chunk_size: int = 61,
    headers: dict[str, str] | None = None,
) -> bytes:
    """An HTTP/1.1 response message, body framed by Content-Length or
    RFC 9112 chunked transfer coding (what response records carry)."""
    lines = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    for k, v in (headers or {}).items():
        lines.append(f"{k}: {v}")
    if chunked:
        lines.append("Transfer-Encoding: chunked")
        framed = bytearray()
        for off in range(0, len(body), chunk_size):
            chunk = body[off : off + chunk_size]
            framed += f"{len(chunk):x}".encode() + _CRLF + chunk + _CRLF
        framed += b"0" + _CRLF + _CRLF
        body = bytes(framed)
    else:
        lines.append(f"Content-Length: {len(body)}")
    return ("\r\n".join(lines) + "\r\n\r\n").encode() + body


def write_warc(records: list[bytes], *, gzip_per_record: bool = True) -> bytes:
    """Concatenate records into a .warc / .warc.gz shard.

    ``gzip_per_record=True`` is the Common Crawl layout: every record
    its own gzip member, members back-to-back — readers can resynchronize
    on member boundaries without inflating skipped records.
    """
    if not gzip_per_record:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip wrapper
        out += co.compress(rec) + co.flush()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _iter_gzip_members(data: bytes):
    """Yield each inflated gzip member of a concatenated-member stream."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"bad gzip member at offset {pos}: {e}") from None
        if not d.eof:
            raise EOFError(f"truncated gzip member at offset {pos}")
        yield out
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover — zlib guarantees progress at eof
            raise ValueError("gzip member made no progress")
        pos += consumed


def _parse_header_block(block: bytes, what: str) -> list[tuple[str, str]]:
    """Named fields with LWS continuation folding (ISO 28500 §4 /
    RFC 9112 §5). Returns (name, value) pairs in order, names as-is."""
    fields: list[tuple[str, str]] = []
    for raw in block.split(_CRLF):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t"):
            if not fields:
                raise ValueError(f"{what}: continuation line before any field")
            k, v = fields[-1]
            fields[-1] = (k, v + " " + raw.strip().decode("utf-8", "replace"))
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            raise ValueError(f"{what}: malformed field line {raw[:40]!r}")
        fields.append(
            (name.strip().decode("ascii"), value.strip().decode("utf-8", "replace"))
        )
    return fields


def _get(fields: list[tuple[str, str]], name: str) -> str | None:
    low = name.lower()
    for k, v in fields:
        if k.lower() == low:
            return v
    return None


def _parse_warc_plain(data: bytes) -> list[dict]:
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding CRLFs (some writers emit extras)
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at offset {pos}")
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise EOFError("truncated WARC version line")
        version = data[pos + 5 : eol].decode("ascii")
        if version not in ("1.0", "1.1"):
            raise ValueError(f"unsupported WARC version {version!r}")
        hdr_end = data.find(_CRLF + _CRLF, eol)
        if hdr_end < 0:
            raise EOFError("truncated WARC header block")
        fields = _parse_header_block(data[eol + 2 : hdr_end], "WARC header")
        clen_s = _get(fields, "Content-Length")
        if clen_s is None or not clen_s.isdigit():
            raise ValueError("WARC record missing numeric Content-Length")
        clen = int(clen_s)
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise EOFError("truncated WARC record payload")
        if data[body_end : body_end + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record missing CRLFCRLF terminator")
        rec_type = _get(fields, "WARC-Type")
        if rec_type is None:
            raise ValueError("WARC record missing WARC-Type")
        records.append(
            {
                "version": version,
                "type": rec_type,
                "uri": _get(fields, "WARC-Target-URI"),
                "date": _get(fields, "WARC-Date"),
                "record_id": _get(fields, "WARC-Record-ID"),
                "content_type": _get(fields, "Content-Type"),
                "content_length": clen,
                "payload": data[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records


def parse_warc(data: bytes) -> list[dict]:
    """Walk a WARC shard → list of record dicts (type/uri/date/
    record_id/content_type/content_length/payload).

    Accepts member-per-record gzip (Common Crawl), whole-file gzip (one
    member, many records), and plain WARC — gzip is sniffed from the
    1f 8b magic and each inflated member is walked with the same plain
    parser, so a member carrying several records still parses.
    """
    if data[:2] == b"\x1f\x8b":
        records = []
        for member in _iter_gzip_members(data):
            records.extend(_parse_warc_plain(member))
        return records
    return _parse_warc_plain(data)


def parse_http_response(payload: bytes) -> dict:
    """Parse the HTTP response message a ``response`` record carries:
    status line, headers, body de-framed (Content-Length / chunked)."""
    hdr_end = payload.find(_CRLF + _CRLF)
    if hdr_end < 0:
        raise EOFError("truncated HTTP header block")
    eol = payload.find(_CRLF)
    status_line = payload[:eol].decode("ascii", "replace")
    m = re.match(r"HTTP/\d\.\d (\d{3})(?: (.*))?$", status_line)
    if not m:
        raise ValueError(f"malformed HTTP status line {status_line!r}")
    status = int(m.group(1))
    fields = _parse_header_block(payload[eol + 2 : hdr_end], "HTTP header")
    body = payload[hdr_end + 4 :]
    te = (_get(fields, "Transfer-Encoding") or "").lower()
    if "chunked" in te:
        out = bytearray()
        pos = 0
        while True:
            eol = body.find(_CRLF, pos)
            if eol < 0:
                raise EOFError("truncated chunk size line")
            size_s = body[pos:eol].split(b";")[0].strip()  # drop extensions
            try:
                size = int(size_s, 16)
            except ValueError:
                raise ValueError(f"bad chunk size {size_s!r}") from None
            pos = eol + 2
            if size == 0:
                break
            if pos + size + 2 > len(body):
                raise EOFError("truncated chunk data")
            out += body[pos : pos + size]
            if body[pos + size : pos + size + 2] != _CRLF:
                raise ValueError("chunk data missing CRLF terminator")
            pos += size + 2
        body = bytes(out)
        chunked = True
    else:
        clen_s = _get(fields, "Content-Length")
        if clen_s is not None:
            clen = int(clen_s)
            if clen > len(body):
                raise EOFError("truncated HTTP body")
            body = body[:clen]
        chunked = False
    return {
        "status": status,
        "headers": fields,
        "content_type": _get(fields, "Content-Type"),
        "chunked": chunked,
        "body": body,
    }


# ---------------------------------------------------------------------------
# HTML → text
# ---------------------------------------------------------------------------

# elements whose CONTENT is not document text
_DROP_CONTENT = re.compile(
    rb"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
# block-level elements whose boundaries imply line breaks
_BLOCK = re.compile(
    rb"</?(p|div|br|li|ul|ol|table|tr|td|th|h[1-6]|header|footer|nav|"
    rb"section|article|aside|blockquote|pre|title|body|html|head|hr|"
    rb"form|main|figure)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG = re.compile(rb"<[^>]*>")

# the core named references (HTML's only universally-safe subset without
# vendoring the full 2k-entry table; numeric refs cover the rest)
_NAMED = {
    b"amp": "&",
    b"lt": "<",
    b"gt": ">",
    b"quot": '"',
    b"apos": "'",
    b"nbsp": " ",
}
# decimal and hex numeric refs are SEPARATE branches: a single
# "#x?[0-9a-fA-F]+" branch lets hex letters reach the decimal parse
# ("&#ab;" would raise instead of surviving verbatim like every other
# malformed ref)
_ENTITY = re.compile(rb"&(#[0-9]+|#[xX][0-9a-fA-F]+|[a-zA-Z]+);")


def _deref(m: re.Match) -> bytes:
    ref = m.group(1)
    if ref[:1] == b"#":
        try:
            cp = int(ref[2:], 16) if ref[1:2] in (b"x", b"X") else int(ref[1:])
        except ValueError:  # defense in depth — regex branches preclude this
            return m.group(0)
        if not 0 < cp <= 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return m.group(0)
        return chr(cp).encode("utf-8")
    rep = _NAMED.get(ref.lower())
    return rep.encode("utf-8") if rep is not None else m.group(0)


def html_to_text(html: bytes | str) -> str:
    """Extract document text: drop comments and script/style/noscript/
    template content, honor block-element line breaks, strip remaining
    tags, decode character references, normalize whitespace (runs of
    spaces/tabs collapse; runs of blank lines collapse; NBSP → space)."""
    raw = html.encode("utf-8") if isinstance(html, str) else html
    raw = _COMMENT.sub(b" ", raw)
    raw = _DROP_CONTENT.sub(b" ", raw)
    # source newlines/tabs are inter-word whitespace in HTML flow (a
    # browser collapses them); only BLOCK boundaries become line breaks
    raw = raw.translate(bytes.maketrans(b"\r\n\t\f\v", b"     "))
    raw = _BLOCK.sub(b"\n", raw)
    raw = _TAG.sub(b" ", raw)
    raw = _ENTITY.sub(_deref, raw)
    text = raw.decode("utf-8", "replace").replace(" ", " ")
    lines = [" ".join(ln.split()) for ln in text.split("\n")]
    out: list[str] = []
    for ln in lines:
        if ln:
            out.append(ln)
        elif out and out[-1] != "":
            out.append("")
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


_MAIN = re.compile(rb"<main\b[^>]*>(.*?)</main\s*>", re.IGNORECASE | re.DOTALL)
_LANG = re.compile(rb"<html\b[^>]*?\blang\s*=\s*[\"']([^\"']+)[\"']", re.IGNORECASE)


def main_content(html: bytes) -> bytes:
    """Readability-style main-content slice: the <main> landmark element
    when present (the HTML5 'dominant content' marker), else the whole
    document — the standard first cut before boilerplate heuristics."""
    m = _MAIN.search(html)
    return m.group(1) if m else html


def html_lang(html: bytes) -> str | None:
    """The document's declared language (<html lang=...>), if any."""
    m = _LANG.search(html)
    return m.group(1).decode("ascii", "replace") if m else None


def html_page(
    body_text: str, *, title: str = "", lang: str = "en", boiler: bool = True
) -> bytes:
    """A deterministic crawl-page fixture around ``body_text``: the text
    is HTML-escaped into a <p>, wrapped in boilerplate (nav/script/style/
    comments/entities) that extraction must strip. Round-trip contract:
    ``" ".join(body_text.split())`` appears VERBATIM as one line of
    ``html_to_text(html_page(body_text))`` (the <p> is its own block
    line), and no script/style/noscript content leaks into any line."""
    esc = (
        body_text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    tesc = title.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    parts = [f'<!DOCTYPE html><html lang="{lang}"><head>']
    parts.append(f"<title>{tesc}</title>")
    if boiler:
        parts.append("<style>body { color: #000; } /* a > b */</style>")
        parts.append('<script type="text/javascript">if (1 < 2) { x["y"] = 3; }</script>')
    parts.append("</head><body>")
    if boiler:
        parts.append("<!-- served by fixture &amp; friends -->")
        parts.append("<nav><ul><li>Home</li><li>About&nbsp;&amp;&nbsp;Contact</li></ul></nav>")
        parts.append("<noscript>enable&nbsp;js</noscript>")
    parts.append(f"<main><p>{esc}</p></main>")
    if boiler:
        parts.append("<footer>&copy; fixture</footer>")  # unknown named ref survives
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")

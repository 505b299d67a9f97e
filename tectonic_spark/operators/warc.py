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
  transfer coding (size-line hex + per-chunk CRLF + 0-chunk trailer),
  then ``Content-Encoding`` representation decoding — ``gzip``/
  ``x-gzip`` and ``deflate`` (both the RFC 9110 zlib form and the
  historic raw-deflate server bug) via stdlib zlib; ``br`` and other
  codings are censused and left undecoded (vendoring the RFC 7932
  static dictionary is a named scope boundary).
* **Charset sniffing** (WHATWG encoding-sniffing order): BOM, then the
  ``Content-Type`` charset parameter, then ``<meta charset>`` /
  ``http-equiv`` within the first 1024 bytes, else UTF-8 — with the
  WHATWG label aliases that matter at crawl scale (latin1/ascii →
  windows-1252, gb2312 → gbk, sjis → shift_jis). Real crawls are
  ~5-10% non-UTF-8; without this those pages extract as mojibake.
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
    "decode_page",
    "html_lang",
    "html_page",
    "html_title",
    "html_to_text",
    "main_content",
    "parse_http_response",
    "parse_warc",
    "sniff_charset",
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
    content_encoding: str | None = None,
    headers: dict[str, str] | None = None,
) -> bytes:
    """An HTTP/1.1 response message: representation first compressed
    per ``content_encoding`` (RFC 9110 ``gzip`` or zlib-wrapped
    ``deflate``), then framed by Content-Length or RFC 9112 chunked
    transfer coding — the layering order the protocol mandates, so a
    parser must de-frame before it decompresses."""
    lines = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    if content_encoding is not None:
        ce = content_encoding.lower()
        if ce in ("gzip", "x-gzip"):
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            body = co.compress(body) + co.flush()
        elif ce == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, 15)
            body = co.compress(body) + co.flush()
        elif ce in ("br", "br:lz", "br:literals", "br:uncompressed", "br:dict"):
            # the ":mode" suffix picks the fixture encoder lane
            # (":dict" emits real §8 static-dictionary references);
            # the wire header is always plain "br"
            from tectonic_spark.operators.brotli import compress

            mode = ce.split(":", 1)[1] if ":" in ce else "lz"
            body = compress(body, mode=mode)
            content_encoding = "br"
        else:
            raise ValueError(f"unsupported content_encoding {content_encoding!r}")
        lines.append(f"Content-Encoding: {content_encoding}")
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
                # the full named-field list, for record types whose
                # semantics live in extension fields (revisit:
                # WARC-Refers-To / WARC-Payload-Digest / WARC-Profile)
                "fields": fields,
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


# per-record decoded-body cap: a few-KB hostile crawl body can legally
# expand to GiBs inside an executor task; past this bound the record is
# censused (ce_decoded=False), never partially decoded
_MAX_DECODED_BODY = 256 << 20


def _decode_content(body: bytes, codings: list[str]) -> tuple[bytes, bool]:
    """Apply Content-Encoding codings in reverse application order.
    Returns (body, decoded). ``br`` decodes through libbrotlidec when
    the shared library is present (the ~30x fast path) and the
    vendored pure-Python RFC 7932 decoder otherwise — the two are
    differential-tested in tests/test_brotli.py. Wholly unknown
    codings (``zstd``, …) census as decoded=False, never mangled, as
    does any body whose decoded size would exceed the
    ``_MAX_DECODED_BODY`` bomb guard. ``deflate`` tries the RFC 9110
    zlib form first, then the raw-deflate form many legacy servers
    actually send."""
    for i in range(len(codings) - 1, -1, -1):
        ce = codings[i]
        if ce in ("identity", ""):
            continue
        if ce == "br":
            from tectonic_spark.operators.brotli import (
                BrotliOutputCapExceeded,
                decompress,
                native_decompress,
            )

            try:
                out = native_decompress(body, max_output=_MAX_DECODED_BODY)
                if out is None:
                    out = decompress(body, max_output=_MAX_DECODED_BODY)
                body = out
            except BrotliOutputCapExceeded:
                return body, False  # bomb guard — census, don't touch
            continue
        if ce in ("gzip", "x-gzip"):
            wbits_options = (31,)
        elif ce == "deflate":
            wbits_options = (15, -15)
        else:
            return body, False  # unsupported coding — census, don't touch
        last: Exception | None = None
        for wbits in wbits_options:
            d = zlib.decompressobj(wbits)
            try:
                out = d.decompress(body, _MAX_DECODED_BODY + 1)
            except zlib.error as e:
                last = e
                continue
            if len(out) > _MAX_DECODED_BODY:
                return body, False  # bomb guard — census, don't touch
            if not d.eof:
                raise EOFError(f"truncated {ce} content coding")
            body = out
            break
        else:
            raise ValueError(f"bad {ce} content coding: {last}")
    return body, True


def parse_http_response(payload: bytes) -> dict:
    """Parse the HTTP response message a ``response`` record carries:
    status line, headers, body de-framed (Content-Length / chunked),
    then Content-Encoding decoded (gzip/x-gzip/deflate; other codings
    censused via ``content_encoding`` with ``ce_decoded=False``)."""
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
    ce_raw = _get(fields, "Content-Encoding")
    codings = (
        [t.strip().lower() for t in ce_raw.split(",")] if ce_raw else []
    )
    ce_decoded = False
    if codings:
        body, ce_decoded = _decode_content(body, codings)
    return {
        "status": status,
        "headers": fields,
        "content_type": _get(fields, "Content-Type"),
        "chunked": chunked,
        "content_encoding": ce_raw,
        "ce_decoded": ce_decoded,
        "body": body,
    }


# ---------------------------------------------------------------------------
# charset sniffing (WHATWG encoding-sniffing order)
# ---------------------------------------------------------------------------

# the WHATWG label aliases that matter at crawl scale (full table is
# ~220 labels; these cover the high-frequency legacy declarations —
# everything else resolves through Python's own codec alias registry)
_CHARSET_ALIASES = {
    "iso-8859-1": "windows-1252",  # WHATWG maps latin1 to cp1252
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "iso8859-1": "windows-1252",
    "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "gb2312": "gbk",  # WHATWG: gb2312 decodes as GBK
    "gb-2312": "gbk",
    "csgb2312": "gbk",
    "x-sjis": "shift_jis",
    "sjis": "shift_jis",
    "shift-jis": "shift_jis",
    "ms_kanji": "shift_jis",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
}

_CT_CHARSET = re.compile(r"charset\s*=\s*\"?([A-Za-z0-9._+:-]+)\"?", re.IGNORECASE)
_META_CHARSET = re.compile(
    rb"<meta\s[^>]*?charset\s*=\s*[\"']?([A-Za-z0-9._+:-]+)", re.IGNORECASE
)


def _resolve_label(label: str) -> str | None:
    """A charset label → a Python codec name, or None if unknown."""
    import codecs

    norm = label.strip().strip("'\"").lower()
    norm = _CHARSET_ALIASES.get(norm, norm)
    try:
        return codecs.lookup(norm).name
    except LookupError:
        return None


def sniff_charset(
    content_type: str | None, body: bytes
) -> tuple[str, str]:
    """Determine a page's character encoding per the WHATWG sniffing
    order: BOM (authoritative, overrides any declaration), Content-Type
    ``charset`` parameter, ``<meta charset>`` / ``http-equiv`` within
    the first 1024 bytes, else the UTF-8 default.

    Returns ``(codec, origin)`` with origin in ``bom | header | meta |
    default | unresolved:<label>`` — unresolved labels fall back to
    UTF-8-with-replacement but stay censused, never silently mangled.
    """
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16", "bom"  # the utf-16 codec consumes + strips the BOM
    label = None
    origin = "default"
    if content_type:
        m = _CT_CHARSET.search(content_type)
        if m:
            label, origin = m.group(1), "header"
    if label is None:
        m = _META_CHARSET.search(body[:1024])
        if m:
            label, origin = m.group(1).decode("ascii", "replace"), "meta"
    if label is None:
        return "utf-8", "default"
    codec = _resolve_label(label)
    if codec is None:
        return "utf-8", f"unresolved:{label}"
    return codec, origin


def decode_page(body: bytes, content_type: str | None = None) -> tuple[str, str, str]:
    """Charset-aware page decode: sniff (BOM / header / meta / default),
    then decode with replacement. Returns ``(text, codec, origin)``."""
    codec, origin = sniff_charset(content_type, body)
    return body.decode(codec, "replace"), codec, origin


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
_TITLE = re.compile(rb"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)


def html_title(html: bytes) -> str | None:
    """The document's <title> text (entity-decoded, whitespace
    collapsed), or None — the first metadata field any curation
    pipeline reads."""
    m = _TITLE.search(html)
    if m is None:
        return None
    return " ".join(html_to_text(m.group(1)).split())


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
    body_text: str,
    *,
    title: str = "",
    lang: str = "en",
    boiler: bool = True,
    charset: str = "utf-8",
    declare: str = "none",
    probe: str = "",
) -> bytes:
    """A deterministic crawl-page fixture around ``body_text``: the text
    is HTML-escaped into a <p>, wrapped in boilerplate (nav/script/style/
    comments/entities) that extraction must strip. Round-trip contract:
    ``" ".join(body_text.split())`` appears VERBATIM as one line of
    ``html_to_text(html_page(body_text))`` (the <p> is its own block
    line), and no script/style/noscript content leaks into any line.

    ``charset`` encodes the page bytes (strict — a fixture bug raises,
    never silently mojibakes); ``declare`` optionally embeds the
    in-document declaration the sniffer must find: ``"meta"`` emits
    ``<meta charset=...>``, ``"http-equiv"`` the legacy pragma form,
    ``"none"`` leaves declaration to the HTTP Content-Type header.
    ``probe``, when non-empty, becomes its own wrapper ``<p>`` after the
    text paragraph — a known non-ASCII sentinel an extractor can verify
    verbatim (and then strip) to prove the decode path was exact."""
    esc = (
        body_text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    tesc = title.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    parts = [f'<!DOCTYPE html><html lang="{lang}"><head>']
    if declare == "meta":
        parts.append(f'<meta charset="{charset}">')
    elif declare == "http-equiv":
        parts.append(
            '<meta http-equiv="Content-Type" '
            f'content="text/html; charset={charset}">'
        )
    elif declare != "none":
        raise ValueError(f"unknown declare mode {declare!r}")
    parts.append(f"<title>{tesc}</title>")
    if boiler:
        parts.append("<style>body { color: #000; } /* a > b */</style>")
        parts.append('<script type="text/javascript">if (1 < 2) { x["y"] = 3; }</script>')
    parts.append("</head><body>")
    if boiler:
        parts.append("<!-- served by fixture &amp; friends -->")
        parts.append("<nav><ul><li>Home</li><li>About&nbsp;&amp;&nbsp;Contact</li></ul></nav>")
        parts.append("<noscript>enable&nbsp;js</noscript>")
    if probe:
        pesc = probe.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        parts.append(
            f'<main><p>{esc}</p><p class="charset-probe">{pesc}</p></main>'
        )
    else:
        parts.append(f"<main><p>{esc}</p></main>")
    if boiler:
        parts.append("<footer>&copy; fixture</footer>")  # unknown named ref survives
    parts.append("</body></html>")
    return "".join(parts).encode(charset)

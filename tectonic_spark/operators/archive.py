"""Archive-format ingestion (ZIP + TAR) — corpus drops and scraped
dataset mirrors ship .zip bundles alongside .gz/.zst shards (a21/a23),
and multimodal training corpora ship WebDataset-style .tar shards;
both containers are implemented structurally (no stdlib zipfile or
tarfile in the data path — the codec-family vendoring ethos; stdlib
interop is PINNED both ways in tests instead).

Scope:

* **Writer**: local file headers, central directory, end-of-central-
  directory record; per-member STORED or DEFLATE (raw zlib, wbits -15).
* **Parser**: EOCD discovery from the tail (comment-tolerant backward
  scan), central-directory walk, local-header cross-validation
  (name/method agreement), raw-deflate inflation, CRC-32 and
  compressed/uncompressed size verification for every member.
* **ZIP64** (r11 — lifts the r10 refusal): EOCD64 record + locator and
  the 0x0001 extra field (8-byte sizes/offset for saturated 32-bit
  fields) parse, and the writer can force the format (``zip64=True``)
  so the >4 GiB *structures* are exercised without 4 GiB fixtures;
  stdlib interop is pinned via a >65535-member archive (the entry-count
  saturation stdlib actually emits).
* **TAR long names** (r11): pax ``x`` extended headers (self-sizing
  ``len key=value\\n`` records; ``path``/``size`` overrides applied to
  the following member), GNU ``L`` longname members, ``g`` global
  defaults, and GNU base-256 numeric fields (>8 GiB sizes).
* **Boundaries**: encrypted members (general-purpose bit 0) are
  refused; data-descriptor framing (bit 3, sizes after payload) is
  parsed via the central directory's authoritative sizes; multi-disk
  archives are refused.

Error taxonomy: ``EOFError`` truncation, ``ValueError`` structural.
"""

from __future__ import annotations

import zlib

__all__ = ["build_tar", "build_zip", "parse_tar", "parse_zip"]

_LOCAL_SIG = b"PK\x03\x04"
_CD_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_SAT32 = 0xFFFFFFFF
_SAT16 = 0xFFFF


def build_zip(
    members: list[tuple[str, bytes, str]], *, zip64: bool = False
) -> bytes:
    """Serialize ``(name, data, method)`` members; method ``"stored"``
    or ``"deflate"``. ``zip64=True`` forces the ZIP64 format (saturated
    32-bit fields + 0x0001 extras + EOCD64/locator) even when values
    fit — the way to exercise the >4 GiB structures without >4 GiB
    fixtures; real writers switch per-field on overflow."""
    out = bytearray()
    cd = bytearray()
    ver = 45 if zip64 else 20
    for name, data, method in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(data)
        if method == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
            m = 8
        elif method == "stored":
            payload = data
            m = 0
        else:
            raise ValueError(f"unknown method {method!r}")
        offset = len(out)
        if zip64:
            l_extra = (
                (1).to_bytes(2, "little")
                + (16).to_bytes(2, "little")
                + len(data).to_bytes(8, "little")
                + len(payload).to_bytes(8, "little")
            )
            c_extra = (
                (1).to_bytes(2, "little")
                + (24).to_bytes(2, "little")
                + len(data).to_bytes(8, "little")
                + len(payload).to_bytes(8, "little")
                + offset.to_bytes(8, "little")
            )
            l_csize = l_usize = _SAT32
            c_off = _SAT32
        else:
            l_extra = c_extra = b""
            l_csize, l_usize = len(payload), len(data)
            c_off = offset

        def common(extra: bytes) -> bytes:
            return (
                ver.to_bytes(2, "little")  # version needed
                + (0).to_bytes(2, "little")  # flags
                + m.to_bytes(2, "little")
                + (0).to_bytes(2, "little")  # dos time
                + (0x21).to_bytes(2, "little")  # dos date (1980-01-01)
                + crc.to_bytes(4, "little")
                + l_csize.to_bytes(4, "little")
                + l_usize.to_bytes(4, "little")
                + len(nb).to_bytes(2, "little")
                + len(extra).to_bytes(2, "little")
            )

        out += _LOCAL_SIG + common(l_extra) + nb + l_extra + payload
        cd += (
            _CD_SIG
            + ver.to_bytes(2, "little")  # version made by
            + common(c_extra)
            + (0).to_bytes(2, "little")  # comment len
            + (0).to_bytes(2, "little")  # disk number
            + (0).to_bytes(2, "little")  # internal attrs
            + (0).to_bytes(4, "little")  # external attrs
            + c_off.to_bytes(4, "little")
            + nb
            + c_extra
        )
    cd_off = len(out)
    out += cd
    if zip64:
        e64_off = len(out)
        out += (
            _EOCD64_SIG
            + (44).to_bytes(8, "little")  # size of remaining record
            + ver.to_bytes(2, "little") * 2
            + bytes(8)  # disk numbers
            + len(members).to_bytes(8, "little") * 2
            + len(cd).to_bytes(8, "little")
            + cd_off.to_bytes(8, "little")
        )
        out += (
            _EOCD64_LOC_SIG
            + bytes(4)  # disk with EOCD64
            + e64_off.to_bytes(8, "little")
            + (1).to_bytes(4, "little")  # total disks
        )
        n16, cds, cdo = _SAT16, _SAT32, _SAT32
    else:
        n16, cds, cdo = len(members), len(cd), cd_off
    out += (
        _EOCD_SIG
        + bytes(4)  # disk numbers
        + n16.to_bytes(2, "little") * 2
        + cds.to_bytes(4, "little")
        + cdo.to_bytes(4, "little")
        + (0).to_bytes(2, "little")  # comment len
    )
    return bytes(out)


def _zip64_fields(
    extra: bytes, usize: int, csize: int, loc_off: int, name: str
) -> tuple[int, int, int]:
    """Resolve saturated 32-bit central-directory fields from the ZIP64
    0x0001 extra field: 8-byte values appear for exactly the saturated
    fields, in usize/csize/offset order (APPNOTE 4.5.3)."""
    pos = 0
    while pos + 4 <= len(extra):
        tag = int.from_bytes(extra[pos : pos + 2], "little")
        size = int.from_bytes(extra[pos + 2 : pos + 4], "little")
        body = extra[pos + 4 : pos + 4 + size]
        if tag == 1:
            bp = 0

            def take(cur: int) -> int:
                nonlocal bp
                if cur != _SAT32:
                    return cur
                if bp + 8 > len(body):
                    raise EOFError(
                        f"member {name!r}: ZIP64 extra field too short"
                    )
                val = int.from_bytes(body[bp : bp + 8], "little")
                bp += 8
                return val

            return take(usize), take(csize), take(loc_off)
        pos += 4 + size
    raise ValueError(
        f"member {name!r}: saturated sizes but no ZIP64 extra field"
    )


def parse_zip(data: bytes) -> list[dict]:
    """Walk the central directory; return per-member dicts with the
    verified inflated payload."""
    # EOCD: backward scan over the maximum comment span. A bare rfind
    # latches onto a spurious 'PK\x05\x06' INSIDE a trailing comment, so
    # candidates are validated: accept the first (scanning backward)
    # whose comment-length field equals the bytes remaining after the
    # 22-byte record — the self-consistency check APPNOTE implies.
    tail_start = max(0, len(data) - 65536 - 22)
    i = data.rfind(_EOCD_SIG, tail_start)
    saw_short = False
    while i >= 0:
        if i + 22 > len(data):
            saw_short = True
        else:
            clen = int.from_bytes(data[i + 20 : i + 22], "little")
            if i + 22 + clen == len(data):
                break
        i = data.rfind(_EOCD_SIG, tail_start, i)
    if i < 0:
        if saw_short:
            raise EOFError("truncated EOCD record")
        raise EOFError("no end-of-central-directory record")
    n_entries = int.from_bytes(data[i + 10 : i + 12], "little")
    cd_size = int.from_bytes(data[i + 12 : i + 16], "little")
    cd_off = int.from_bytes(data[i + 16 : i + 20], "little")
    # ZIP64: the EOCD64 locator sits IMMEDIATELY before the EOCD
    # (APPNOTE 4.3.15); its record carries the 8-byte counts/offsets
    # the 32/16-bit EOCD fields saturate at
    if i >= 20 and data[i - 20 : i - 16] == _EOCD64_LOC_SIG:
        if int.from_bytes(data[i - 4 : i], "little") != 1:
            raise NotImplementedError("multi-disk ZIP64 archives are refused")
        e64 = int.from_bytes(data[i - 12 : i - 4], "little")
        if data[e64 : e64 + 4] != _EOCD64_SIG:
            raise ValueError("EOCD64 locator points at a non-EOCD64 record")
        if e64 + 56 > len(data):
            raise EOFError("truncated EOCD64 record")
        n_entries = int.from_bytes(data[e64 + 32 : e64 + 40], "little")
        cd_size = int.from_bytes(data[e64 + 40 : e64 + 48], "little")
        cd_off = int.from_bytes(data[e64 + 48 : e64 + 56], "little")
    elif _SAT16 in (n_entries,) or _SAT32 in (cd_size, cd_off):
        raise ValueError("saturated EOCD fields without an EOCD64 locator")
    if cd_off + cd_size > len(data):
        raise EOFError("central directory overruns file")
    out = []
    pos = cd_off
    for _ in range(n_entries):
        if data[pos : pos + 4] != _CD_SIG:
            raise ValueError(f"bad central-directory signature at {pos}")
        flags = int.from_bytes(data[pos + 8 : pos + 10], "little")
        if flags & 0x1:
            raise NotImplementedError("encrypted ZIP members are refused")
        method = int.from_bytes(data[pos + 10 : pos + 12], "little")
        crc = int.from_bytes(data[pos + 16 : pos + 20], "little")
        csize = int.from_bytes(data[pos + 20 : pos + 24], "little")
        usize = int.from_bytes(data[pos + 24 : pos + 28], "little")
        nlen = int.from_bytes(data[pos + 28 : pos + 30], "little")
        elen = int.from_bytes(data[pos + 30 : pos + 32], "little")
        clen = int.from_bytes(data[pos + 32 : pos + 34], "little")
        loc_off = int.from_bytes(data[pos + 42 : pos + 46], "little")
        name = data[pos + 46 : pos + 46 + nlen].decode("utf-8")
        if _SAT32 in (csize, usize, loc_off):
            extra = data[pos + 46 + nlen : pos + 46 + nlen + elen]
            usize, csize, loc_off = _zip64_fields(
                extra, usize, csize, loc_off, name
            )
        pos += 46 + nlen + elen + clen
        # local header cross-validation
        if data[loc_off : loc_off + 4] != _LOCAL_SIG:
            raise ValueError(f"member {name!r}: bad local header signature")
        l_nlen = int.from_bytes(data[loc_off + 26 : loc_off + 28], "little")
        l_elen = int.from_bytes(data[loc_off + 28 : loc_off + 30], "little")
        l_name = data[loc_off + 30 : loc_off + 30 + l_nlen].decode("utf-8")
        if l_name != name:
            raise ValueError(
                f"member name mismatch: CD {name!r} vs local {l_name!r}"
            )
        dstart = loc_off + 30 + l_nlen + l_elen
        if dstart + csize > len(data):
            raise EOFError(f"member {name!r}: truncated payload")
        payload = data[dstart : dstart + csize]
        if method == 8:
            d = zlib.decompressobj(-15)
            try:
                raw = d.decompress(payload)
            except zlib.error as e:
                raise ValueError(f"member {name!r}: bad deflate: {e}") from None
            if not d.eof:
                raise EOFError(f"member {name!r}: truncated deflate stream")
        elif method == 0:
            raw = payload
        else:
            raise NotImplementedError(f"compression method {method}")
        if len(raw) != usize:
            raise ValueError(
                f"member {name!r}: size mismatch ({len(raw)} vs {usize})"
            )
        if zlib.crc32(raw) != crc:
            raise ValueError(f"member {name!r}: CRC mismatch")
        out.append(
            {"name": name, "method": method, "usize": usize, "data": raw}
        )
    return out


# ---------------------------------------------------------------------------
# TAR (POSIX ustar) — the container of WebDataset-style training shards
# ---------------------------------------------------------------------------

_TAR_BLOCK = 512


def _octal(field: bytes, what: str) -> int:
    # GNU base-256: high bit of the first byte set → the field is a
    # big-endian binary number (how >8 GiB sizes are stored)
    if field and field[0] & 0x80:
        return int.from_bytes(bytes([field[0] & 0x7F]) + field[1:], "big")
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(f"bad octal {what} field {field!r}") from None


def _tar_header(name_b: bytes, size: int, typeflag: bytes) -> bytes:
    """One 512-byte ustar header block with a computed checksum."""
    if len(name_b) > 100:
        raise ValueError(f"header name too long ({len(name_b)} > 100)")
    hdr = bytearray(_TAR_BLOCK)
    hdr[0 : len(name_b)] = name_b
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"  # uid
    hdr[116:124] = b"0000000\x00"  # gid
    hdr[124:136] = f"{size:011o}\x00".encode()
    hdr[136:148] = b"00000000000\x00"  # mtime (deterministic fixture)
    hdr[148:156] = b" " * 8  # checksum placeholder
    hdr[156:157] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = f"{chk:06o}\x00 ".encode()
    return bytes(hdr)


def _pax_record(key: str, value: str) -> bytes:
    """One pax extended-header record: ``"<len> <key>=<value>\\n"``
    where ``<len>`` counts the WHOLE record including its own digits —
    the self-referential length POSIX.1-2001 specifies."""
    base = len(f" {key}={value}\n".encode("utf-8"))
    n = base + 1
    while len(str(n)) + base != n:
        n = len(str(n)) + base
    return f"{n} {key}={value}\n".encode("utf-8")


def _pad(data: bytes) -> bytes:
    return data + bytes((-len(data)) % _TAR_BLOCK)


def build_tar(
    members: list[tuple[str, bytes]], *, longname_mode: str = "pax"
) -> bytes:
    """Serialize ``(name, data)`` regular files as a POSIX ustar
    archive (the WebDataset shard layout: flat files, 512-byte blocks,
    two zero blocks at the end). Names over ustar's 100-byte limit are
    carried by ``longname_mode``: ``"pax"`` emits an ``x`` extended
    header with a ``path`` record, ``"gnu"`` a ``././@LongLink`` ``L``
    member — the two encodings real shards use."""
    out = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            if longname_mode == "pax":
                rec = _pax_record("path", name)
                out += _tar_header(
                    (b"PaxHeaders.0/" + nb)[:100], len(rec), b"x"
                )
                out += _pad(rec)
            elif longname_mode == "gnu":
                body = nb + b"\x00"
                out += _tar_header(b"././@LongLink", len(body), b"L")
                out += _pad(body)
            else:
                raise ValueError(f"unknown longname_mode {longname_mode!r}")
            nb = nb[:100]  # the ustar header carries the truncated name
        out += _tar_header(nb, len(data), b"0")
        out += _pad(data)
    out += bytes(2 * _TAR_BLOCK)
    return bytes(out)


def _parse_pax(body: bytes) -> dict[str, str]:
    """Pax extended-header records → {key: value}."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(body):
        sp = body.find(b" ", pos)
        if sp < 0:
            raise ValueError(f"malformed pax record at {pos}")
        try:
            n = int(body[pos:sp])
        except ValueError:
            raise ValueError(f"bad pax record length at {pos}") from None
        rec = body[pos : pos + n]
        if len(rec) < n or not rec.endswith(b"\n"):
            raise EOFError("truncated pax record")
        kv = rec[sp - pos + 1 : -1]
        k, eq, v = kv.partition(b"=")
        if not eq:
            raise ValueError(f"pax record without '=': {kv[:40]!r}")
        out[k.decode("utf-8")] = v.decode("utf-8")
        pos += n
    return out


def parse_tar(data: bytes) -> list[dict]:
    """Walk a ustar/pax/GNU archive → [{name, size, data}] for regular
    files. Directories are skipped; pax ``x`` extended headers (``path``
    / ``size`` overrides), ``g`` global defaults, GNU ``L`` longname /
    ``K`` longlink members, and GNU base-256 numeric fields are all
    applied to the following member. Header checksums verified."""
    out = []
    pos = 0
    n = len(data)
    pend_name: str | None = None
    pend_pax: dict[str, str] | None = None
    globals_: dict[str, str] = {}
    while pos + _TAR_BLOCK <= n:
        hdr = data[pos : pos + _TAR_BLOCK]
        if hdr == bytes(_TAR_BLOCK):  # first zero block ends the archive
            return out
        if hdr[257:262] not in (b"ustar", b"usta\x00"):
            raise ValueError(f"bad ustar magic at offset {pos}")
        stored = _octal(hdr[148:156], "checksum")
        actual = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != actual:
            raise ValueError(f"tar header checksum mismatch at offset {pos}")
        size = _octal(hdr[124:136], "size")
        typeflag = hdr[156:157]
        name = hdr[:100].split(b"\x00", 1)[0].decode("utf-8")
        pos += _TAR_BLOCK
        if typeflag in (b"0", b"\x00"):
            # apply accumulated overrides: global defaults, then the
            # member's own pax records, then a GNU longname (strongest)
            eff = dict(globals_)
            if pend_pax:
                eff.update(pend_pax)
            if "size" in eff:
                size = int(eff["size"])
            if pend_name is not None:
                name = pend_name
            elif "path" in eff:
                name = eff["path"]
            pend_name = pend_pax = None
        nblocks = (size + _TAR_BLOCK - 1) // _TAR_BLOCK
        if pos + nblocks * _TAR_BLOCK > n:
            raise EOFError(f"truncated tar member {name!r}")
        body = data[pos : pos + size]
        if typeflag in (b"0", b"\x00"):
            out.append({"name": name, "size": size, "data": body})
        elif typeflag == b"5":
            pass  # directory
        elif typeflag == b"L":  # GNU longname: applies to the NEXT member
            pend_name = body.split(b"\x00", 1)[0].decode("utf-8")
        elif typeflag == b"K":  # GNU longlink: parsed, target not materialized
            pass
        elif typeflag == b"x":
            pend_pax = _parse_pax(body)
        elif typeflag == b"g":
            globals_.update(_parse_pax(body))
        else:
            raise ValueError(f"unsupported tar typeflag {typeflag!r}")
        pos += nblocks * _TAR_BLOCK
    raise EOFError("tar archive missing end-of-archive zero blocks")

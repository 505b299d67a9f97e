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
* **Boundaries**: ZIP64 (EOCD64 locator) raises ``NotImplementedError``;
  encrypted members (general-purpose bit 0) are refused; data-descriptor
  framing (bit 3, sizes after payload) is parsed via the central
  directory's authoritative sizes.

Error taxonomy: ``EOFError`` truncation, ``ValueError`` structural.
"""

from __future__ import annotations

import zlib

__all__ = ["build_tar", "build_zip", "parse_tar", "parse_zip"]

_LOCAL_SIG = b"PK\x03\x04"
_CD_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"


def build_zip(members: list[tuple[str, bytes, str]]) -> bytes:
    """Serialize ``(name, data, method)`` members; method ``"stored"``
    or ``"deflate"``."""
    out = bytearray()
    cd = bytearray()
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
        common = (
            (20).to_bytes(2, "little")  # version needed
            + (0).to_bytes(2, "little")  # flags
            + m.to_bytes(2, "little")
            + (0).to_bytes(2, "little")  # dos time
            + (0x21).to_bytes(2, "little")  # dos date (1980-01-01)
            + crc.to_bytes(4, "little")
            + len(payload).to_bytes(4, "little")
            + len(data).to_bytes(4, "little")
            + len(nb).to_bytes(2, "little")
            + (0).to_bytes(2, "little")  # extra len
        )
        out += _LOCAL_SIG + common + nb + payload
        cd += (
            _CD_SIG
            + (20).to_bytes(2, "little")  # version made by
            + common
            + (0).to_bytes(2, "little")  # comment len
            + (0).to_bytes(2, "little")  # disk number
            + (0).to_bytes(2, "little")  # internal attrs
            + (0).to_bytes(4, "little")  # external attrs
            + offset.to_bytes(4, "little")
            + nb
        )
    cd_off = len(out)
    out += cd
    out += (
        _EOCD_SIG
        + bytes(4)  # disk numbers
        + len(members).to_bytes(2, "little") * 2
        + len(cd).to_bytes(4, "little")
        + cd_off.to_bytes(4, "little")
        + (0).to_bytes(2, "little")  # comment len
    )
    return bytes(out)


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
    if data.rfind(_EOCD64_LOC_SIG, tail_start, i) >= 0:
        raise NotImplementedError("ZIP64 archives are not parsed")
    if i + 22 > len(data):
        raise EOFError("truncated EOCD record")
    n_entries = int.from_bytes(data[i + 10 : i + 12], "little")
    cd_size = int.from_bytes(data[i + 12 : i + 16], "little")
    cd_off = int.from_bytes(data[i + 16 : i + 20], "little")
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
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise ValueError(f"bad octal {what} field {field!r}") from None


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Serialize ``(name, data)`` regular files as a POSIX ustar
    archive (the WebDataset shard layout: flat files, 512-byte blocks,
    two zero blocks at the end)."""
    out = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError(f"name too long for ustar ({len(nb)} > 100)")
        hdr = bytearray(_TAR_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"  # uid
        hdr[116:124] = b"0000000\x00"  # gid
        hdr[124:136] = f"{len(data):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"  # mtime (deterministic fixture)
        hdr[148:156] = b" " * 8  # checksum placeholder
        hdr[156:157] = b"0"  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}\x00 ".encode()
        out += hdr
        out += data
        pad = (-len(data)) % _TAR_BLOCK
        out += bytes(pad)
    out += bytes(2 * _TAR_BLOCK)
    return bytes(out)


def parse_tar(data: bytes) -> list[dict]:
    """Walk a ustar archive → [{name, size, data}] for regular files
    (directories skipped; pax/GNU long-name extensions raise — the
    WebDataset layout never needs them). Header checksums verified."""
    out = []
    pos = 0
    n = len(data)
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
        nblocks = (size + _TAR_BLOCK - 1) // _TAR_BLOCK
        if pos + nblocks * _TAR_BLOCK > n:
            raise EOFError(f"truncated tar member {name!r}")
        if typeflag in (b"0", b"\x00"):
            out.append({"name": name, "size": size,
                        "data": data[pos : pos + size]})
        elif typeflag == b"5":
            pass  # directory
        elif typeflag in (b"x", b"g", b"L", b"K"):
            raise NotImplementedError(
                "pax/GNU long-name tar extensions are not parsed"
            )
        else:
            raise ValueError(f"unsupported tar typeflag {typeflag!r}")
        pos += nblocks * _TAR_BLOCK
    raise EOFError("tar archive missing end-of-archive zero blocks")

"""ZIP archive ingestion — corpus drops and scraped-dataset mirrors ship
.zip bundles alongside .gz/.zst shards (a21/a23); this completes the
engine's archive-format family with a structural implementation of the
PKWARE APPNOTE container grammar (no stdlib ``zipfile`` in the data
path — same vendoring ethos as the codec family).

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

__all__ = ["build_zip", "parse_zip"]

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
    # EOCD: backward scan over the maximum comment span
    tail_start = max(0, len(data) - 65536 - 22)
    i = data.rfind(_EOCD_SIG, tail_start)
    if i < 0:
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

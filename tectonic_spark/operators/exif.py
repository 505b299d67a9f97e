"""EXIF metadata extraction (round 10, m21 — VERDICT r9 item 3: crawl
pipelines read orientation / timestamp / GPS before dedup and
filtering).

EXIF **is** a TIFF structure: a byte-order header + IFD tag walk, with
camera metadata in IFD0, a private Exif sub-IFD behind tag 34665, and
a GPS sub-IFD behind tag 34853. This module therefore reuses
:func:`tectonic_spark.operators.tiff._read_ifd` — the same walker that
decodes TIFF pages — extended in r10 with RATIONAL support (GPS
coordinates and exposure times are RATIONALs). All tag numbers and the
``Exif\\x00\\x00`` APP1 framing derive from the public EXIF and JPEG
specifications.

Carriers wired here:

* **JPEG**: the APP1 (0xFFE1) segment — :func:`exif_from_jpeg` walks
  marker lengths to the first SOS (the same walk jpeg.py's header
  cache uses) and returns the TIFF payload;
  :func:`insert_exif_jpeg` splices an APP1 after SOI, so any m08
  fixture can carry metadata.
* **WebP**: the VP8X EXIF chunk (webp.py ``exif_payload`` surfaces the
  raw bytes; ``encode_webp(exif=...)`` writes the extended container).
* **TIFF itself**: tags simply live in IFD0 next to the image tags.

GPS coordinates are surfaced BOTH as the raw degree/minute/second
rationals and as exact integer milli-arcseconds
(``deg*3600000 + min*60000 + sec*1000``) so downstream queries stay in
integer space — float DMS arithmetic would break cross-engine hashes.

100 TB shape: pure per-payload header parsing inside the same
Arrow-batched mapInPandas stage that decodes pixels; no shuffle, no
state.

Reference parity note: the reference engine has no codec/metadata
surface; this module belongs to the beyond-reference multimodal
family (m21).
"""

from __future__ import annotations

import struct

from tectonic_spark.operators.tiff import _parse_header, _read_ifd

# IFD0
_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
_TAG_GPS_IFD = 34853
# Exif sub-IFD
_TAG_EXPOSURE = 33434
_TAG_ISO = 34855
_TAG_DATETIME_ORIGINAL = 36867
_TAG_PIXEL_X = 40962
_TAG_PIXEL_Y = 40963
# GPS sub-IFD
_TAG_GPS_LAT_REF = 1
_TAG_GPS_LAT = 2
_TAG_GPS_LON_REF = 3
_TAG_GPS_LON = 4
_TAG_GPS_ALT = 6

_EXIF_PREFIX = b"Exif\x00\x00"


def _ascii(entries, tag):
    v = entries.get(tag)
    if v is None:
        return None
    return bytes(v).split(b"\x00", 1)[0].decode("ascii", "replace")


def _first(entries, tag):
    v = entries.get(tag)
    return v[0] if v else None


def _dms_to_mas(dms) -> int | None:
    """(deg, min, sec) rationals → exact integer milli-arcseconds.
    Raises on denominators that do not divide exactly — fixtures and
    real cameras use 1/1, 100 or 1000 denominators that do."""
    if not dms or len(dms) != 3:
        return None
    (dn, dd), (mn, md), (sn, sd) = dms
    total = dn * 3600000 * md * sd + mn * 60000 * dd * sd + sn * 1000 * dd * md
    den = dd * md * sd
    if den == 0 or total % den:
        raise ValueError("GPS rational does not reduce to milli-arcseconds")
    return total // den


def parse_exif(data: bytes) -> dict:
    """Parse an EXIF payload (with or without the ``Exif\\x00\\x00``
    APP1 prefix) into a flat metadata dict. Unknown tags are counted,
    not dropped silently."""
    if data[:6] == _EXIF_PREFIX:
        data = data[6:]
    bo, off = _parse_header(data)
    ifd0, _ = _read_ifd(data, bo, off)
    out = {
        "byte_order": "MM" if bo == ">" else "II",
        "make": _ascii(ifd0, _TAG_MAKE),
        "model": _ascii(ifd0, _TAG_MODEL),
        "orientation": _first(ifd0, _TAG_ORIENTATION),
        "datetime": _ascii(ifd0, _TAG_DATETIME),
        "n_ifd0_tags": len(ifd0),
        "datetime_original": None,
        "exposure": None,
        "iso": None,
        "pixel_x": None,
        "pixel_y": None,
        "gps_lat_ref": None,
        "gps_lat": None,
        "gps_lat_mas": None,
        "gps_lon_ref": None,
        "gps_lon": None,
        "gps_lon_mas": None,
        "gps_alt": None,
    }
    exif_off = _first(ifd0, _TAG_EXIF_IFD)
    if exif_off is not None:
        sub, _ = _read_ifd(data, bo, exif_off)
        out["datetime_original"] = _ascii(sub, _TAG_DATETIME_ORIGINAL)
        out["exposure"] = _first(sub, _TAG_EXPOSURE)
        out["iso"] = _first(sub, _TAG_ISO)
        out["pixel_x"] = _first(sub, _TAG_PIXEL_X)
        out["pixel_y"] = _first(sub, _TAG_PIXEL_Y)
    gps_off = _first(ifd0, _TAG_GPS_IFD)
    if gps_off is not None:
        gps, _ = _read_ifd(data, bo, gps_off)
        out["gps_lat_ref"] = _ascii(gps, _TAG_GPS_LAT_REF)
        out["gps_lat"] = gps.get(_TAG_GPS_LAT)
        out["gps_lat_mas"] = _dms_to_mas(gps.get(_TAG_GPS_LAT))
        out["gps_lon_ref"] = _ascii(gps, _TAG_GPS_LON_REF)
        out["gps_lon"] = gps.get(_TAG_GPS_LON)
        out["gps_lon_mas"] = _dms_to_mas(gps.get(_TAG_GPS_LON))
        out["gps_alt"] = _first(gps, _TAG_GPS_ALT)
    return out


# ------------------------------------------------------------ JPEG carrier


def exif_from_jpeg(data: bytes) -> bytes | None:
    """TIFF payload of the first EXIF APP1 segment, or None. Walks
    marker lengths to the first SOS (entropy data never contains
    marker-length segments before it)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync in header walk")
        marker = data[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: header over
            return None
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xE1 and data[pos + 4 : pos + 10] == _EXIF_PREFIX:
            return data[pos + 10 : pos + 2 + ln]
        pos += 2 + ln
    return None


def insert_exif_jpeg(jpeg: bytes, exif_tiff: bytes) -> bytes:
    """Splice an EXIF APP1 segment right after SOI (where cameras put
    it); the rest of the stream is untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    payload = _EXIF_PREFIX + exif_tiff
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF payload exceeds APP1 capacity")
    return (
        jpeg[:2]
        + b"\xff\xe1"
        + struct.pack(">H", len(payload) + 2)
        + payload
        + jpeg[2:]
    )


# ------------------------------------------------------- fixture encoder


def build_exif(
    orientation: int = 1,
    datetime: str | None = None,
    datetime_original: str | None = None,
    make: str | None = None,
    model: str | None = None,
    exposure: tuple[int, int] | None = None,
    iso: int | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    gps_lat: tuple | None = None,  # (ref, (d,dd), (m,md), (s,sd))
    gps_lon: tuple | None = None,
    gps_alt: tuple[int, int] | None = None,
    big_endian: bool = False,
    prefix: bool = True,
) -> bytes:
    """Deterministic EXIF writer: IFD0 + Exif sub-IFD + GPS sub-IFD,
    out-of-line ASCII/RATIONAL data, spec-sorted tags. The layout
    mirrors tiff.encode_tiff's entry builder (same 12-byte entries,
    same left-justified inline SHORT gotcha)."""
    bo = ">" if big_endian else "<"

    def build_ifd(tags: list[tuple[int, int, object]], base: int) -> bytes:
        """tags: (tag, type, value). base = absolute offset of this IFD
        within the TIFF structure."""
        entries = []
        extra = bytearray()
        n = len(tags)
        data_base = base + 2 + 12 * n + 4
        for tag, typ, val in sorted(tags, key=lambda t: t[0]):
            if typ == 2:  # ASCII, NUL-terminated
                raw = val.encode("ascii") + b"\x00"
                count = len(raw)
                if count <= 4:
                    entries.append(
                        struct.pack(bo + "HHI", tag, 2, count)
                        + raw.ljust(4, b"\x00")
                    )
                else:
                    entries.append(
                        struct.pack(
                            bo + "HHII", tag, 2, count, data_base + len(extra)
                        )
                    )
                    extra += raw
            elif typ == 3:  # SHORT (inline, left-justified)
                entries.append(
                    struct.pack(bo + "HHI", tag, 3, 1)
                    + struct.pack(bo + "H", val)
                    + b"\x00\x00"
                )
            elif typ == 4:  # LONG
                entries.append(struct.pack(bo + "HHII", tag, 4, 1, val))
            elif typ == 5:  # RATIONAL(s)
                vals = val if isinstance(val, list) else [val]
                entries.append(
                    struct.pack(
                        bo + "HHII", tag, 5, len(vals), data_base + len(extra)
                    )
                )
                for num, den in vals:
                    extra += struct.pack(bo + "II", num, den)
            else:
                raise ValueError(f"unsupported EXIF tag type {typ}")
        return (
            struct.pack(bo + "H", n)
            + b"".join(entries)
            + struct.pack(bo + "I", 0)
            + bytes(extra)
        )

    def ifd_size(tags) -> int:
        size = 2 + 12 * len(tags) + 4
        for tag, typ, val in tags:
            if typ == 2:
                raw_len = len(val) + 1
                if raw_len > 4:
                    size += raw_len
            elif typ == 5:
                vals = val if isinstance(val, list) else [val]
                size += 8 * len(vals)
        return size

    exif_tags = []
    if datetime_original is not None:
        exif_tags.append((_TAG_DATETIME_ORIGINAL, 2, datetime_original))
    if exposure is not None:
        exif_tags.append((_TAG_EXPOSURE, 5, exposure))
    if iso is not None:
        exif_tags.append((_TAG_ISO, 3, iso))
    if pixel_x is not None:
        exif_tags.append((_TAG_PIXEL_X, 4, pixel_x))
    if pixel_y is not None:
        exif_tags.append((_TAG_PIXEL_Y, 4, pixel_y))

    gps_tags = []
    if gps_lat is not None:
        ref, d, m, s = gps_lat
        gps_tags.append((_TAG_GPS_LAT_REF, 2, ref))
        gps_tags.append((_TAG_GPS_LAT, 5, [d, m, s]))
    if gps_lon is not None:
        ref, d, m, s = gps_lon
        gps_tags.append((_TAG_GPS_LON_REF, 2, ref))
        gps_tags.append((_TAG_GPS_LON, 5, [d, m, s]))
    if gps_alt is not None:
        gps_tags.append((_TAG_GPS_ALT, 5, gps_alt))

    ifd0_tags: list[tuple[int, int, object]] = [
        (_TAG_ORIENTATION, 3, orientation)
    ]
    if make is not None:
        ifd0_tags.append((_TAG_MAKE, 2, make))
    if model is not None:
        ifd0_tags.append((_TAG_MODEL, 2, model))
    if datetime is not None:
        ifd0_tags.append((_TAG_DATETIME, 2, datetime))
    # sub-IFD pointers need final offsets: IFD0 at 8, subs laid after
    n_ifd0 = len(ifd0_tags) + (1 if exif_tags else 0) + (1 if gps_tags else 0)
    probe = list(ifd0_tags)
    if exif_tags:
        probe.append((_TAG_EXIF_IFD, 4, 0))
    if gps_tags:
        probe.append((_TAG_GPS_IFD, 4, 0))
    assert len(probe) == n_ifd0
    ifd0_size = ifd_size(probe)
    exif_off = 8 + ifd0_size
    gps_off = exif_off + (ifd_size(exif_tags) if exif_tags else 0)
    final = list(ifd0_tags)
    if exif_tags:
        final.append((_TAG_EXIF_IFD, 4, exif_off))
    if gps_tags:
        final.append((_TAG_GPS_IFD, 4, gps_off))

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(bo + "HI", 42, 8)
    out += build_ifd(final, 8)
    if exif_tags:
        out += build_ifd(exif_tags, exif_off)
    if gps_tags:
        out += build_ifd(gps_tags, gps_off)
    tiff = bytes(out)
    return _EXIF_PREFIX + tiff if prefix else tiff

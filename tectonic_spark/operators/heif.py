"""HEIF/AVIF structural census — the web's fastest-growing image
format (AVIF = AV1 stills in the HEIF/ISOBMFF item structure), so an
image census limited to JPEG/PNG/GIF/TIFF/WebP goes blind exactly
where new crawls grow.

Scope (structural, ISO/IEC 14496-12 + 23008-12 derivable):

* **Box grammar**: the same 32-bit/64-bit/to-end size forms the MP4
  walker uses (h264.py:parse_mp4 — cited for the shared grammar).
* **Item structure** (the HEIF half MP4 lacks): ``meta`` fullbox with
  ``hdlr`` (handler must be ``pict``), ``pitm`` (primary item),
  ``iinf``/``infe`` (item registry: id → type), ``iloc`` (item →
  byte extents; versions 0/1/2, field widths 0/4/8, base_offset,
  construction methods 0 = file offsets and 1 = idat-housed — the
  forms real iPhone HEICs ship; method 2 (item offsets) and nonzero
  extent_index stay named refusals), ``idat``, ``iprp`` =
  ``ipco`` (property pool: ``ispe`` spatial extents, ``av1C`` codec
  config, ``pixi`` bit depths, ``auxC`` auxiliary type) + ``ipma``
  (item → property associations, essential bit), and ``iref`` with
  ``auxl`` references (how an alpha plane points at its master).
* **Census**: brand, item count/types, primary item dimensions (via
  its ipma→ispe association, not guessed), bit depth, alpha presence
  (auxl edge + auxC urn), per-item byte extents verified inside mdat,
  ``bytes_walked``.

AV1 OBU payload decode is documented OUT of scope (the m16 H.264 /
m25 VP8-VP9 boundary): payloads are censused byte ranges.

Error taxonomy: ``EOFError`` truncation, ``ValueError`` structural.
100 TB shape: per-payload header walk in Arrow-batched mapInPandas.
"""

from __future__ import annotations

import struct

__all__ = ["encode_avif", "parse_avif"]

_ALPHA_URN = "urn:mpeg:mpegB:cicp:systems:auxiliary:alpha"


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _fullbox(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def encode_avif(
    *,
    width: int,
    height: int,
    primary_payload: bytes,
    alpha_payload: bytes | None = None,
    bit_depth: int = 8,
    iloc_version: int = 0,
    construction: str = "file",
    base_offset: bool = False,
    derived_span: tuple[int, int] | None = None,
) -> bytes:
    """A structurally complete AVIF still: ftyp(avif), meta with the
    full item apparatus, payloads in mdat (``construction="file"``,
    iloc extents at true file offsets via two-pass assembly — the meta
    size is fixed, so offsets resolve exactly) or housed in an idat
    box inside meta (``construction="idat"``, iloc v1/v2 construction
    method 1, idat-relative extents — the form real HEICs ship
    thumbnails and small items in). ``iloc_version`` picks the 0/1/2
    entry layout (v2 = 32-bit item IDs); ``base_offset`` (file
    construction only) writes extents relative to a 4-byte
    base_offset at the mdat payload start instead of absolute."""
    if iloc_version not in (0, 1, 2):
        raise ValueError(f"iloc version {iloc_version} not writable")
    if construction not in ("file", "idat"):
        raise ValueError(f"unknown construction {construction!r}")
    if construction == "idat" and iloc_version == 0:
        raise ValueError("idat construction needs iloc version >= 1")
    if derived_span is not None:
        if iloc_version == 0 or construction != "file":
            raise ValueError(
                "derived (construction method 2) items need iloc "
                "version >= 1 and file construction"
            )
        if derived_span[0] + derived_span[1] > len(primary_payload):
            raise ValueError("derived span exceeds the primary payload")
    ftyp = _box(b"ftyp", b"avif" + bytes(4) + b"avif" + b"mif1")
    items = [(1, b"av01", primary_payload)]
    if alpha_payload is not None:
        items.append((2, b"av01", alpha_payload))

    def build_meta(offsets: list[int], base: int = 0) -> bytes:
        hdlr = _fullbox(b"hdlr", bytes(4) + b"pict" + bytes(12) + b"\x00")
        pitm = _fullbox(b"pitm", struct.pack(">H", 1))
        infes = b"".join(
            _fullbox(
                b"infe",
                struct.pack(">HH", iid, 0) + itype + b"\x00",
                version=2,
            )
            for iid, itype, _p in items
        )
        n_infe = len(items)
        if derived_span is not None:
            infes += _fullbox(
                b"infe", struct.pack(">HH", 3, 0) + b"av01\x00", version=2
            )
            n_infe += 1
        iinf = _fullbox(b"iinf", struct.pack(">H", n_infe) + infes)
        # property pool: 1 ispe, 2 av1C, 3 pixi, (4 auxC when alpha)
        props = [
            _fullbox(b"ispe", struct.pack(">II", width, height)),
            # av1C: marker|version, profile/level byte, flags byte —
            # opaque config (OBU decode out of scope)
            _box(b"av1C", bytes([0x81, 0x00, 0x0C, 0x00])),
            _fullbox(b"pixi", bytes([3, bit_depth, bit_depth, bit_depth])),
        ]
        if alpha_payload is not None:
            props.append(
                _fullbox(b"auxC", _ALPHA_URN.encode("ascii") + b"\x00")
            )
        ipco = _box(b"ipco", b"".join(props))
        # associations: primary -> (1,2,3); alpha -> (1,2,3,4)
        n_assoc = len(items) + (1 if derived_span is not None else 0)
        assoc = struct.pack(">I", n_assoc)
        assoc_rows = {1: [1, 2, 3], 2: [1, 2, 3, 4], 3: [1, 2, 3]}
        assoc_ids = [iid for iid, _t, _p in items]
        if derived_span is not None:
            assoc_ids.append(3)
        for iid in assoc_ids:
            idxs = assoc_rows[iid]
            assoc += struct.pack(">HB", iid, len(idxs))
            assoc += bytes(0x80 | i for i in idxs)  # essential bit set
        ipma = _fullbox(b"ipma", assoc)
        iprp = _box(b"iprp", ipco + ipma)
        # iloc: offset_size=4 length_size=4; base_offset_size 4 when
        # the base_offset lane is on, else 0; index_size 0 (v1/v2)
        base_sz = 4 if base_offset else 0
        idx_sz = 4 if derived_span is not None else 0
        method = 1 if construction == "idat" else 0
        il = bytes([0x44, (base_sz << 4) | idx_sz])
        n_entries = len(items) + (1 if derived_span is not None else 0)
        if iloc_version == 2:
            il += struct.pack(">I", n_entries)
        else:
            il += struct.pack(">H", n_entries)
        entry_rows = [
            (iid, method, base if base_sz else 0, 0, off, len(payload))
            for (iid, _t, payload), off in zip(items, offsets)
        ]
        if derived_span is not None:
            # method 2: offsets index the data of the item named by the
            # 'iloc' item reference (extent_index is 1-based into it)
            entry_rows.append(
                (3, 2, 0, 1, derived_span[0], derived_span[1])
            )
        for iid, mth, bval, eidx, off, ln in entry_rows:
            if iloc_version == 2:
                il += struct.pack(">I", iid)
            else:
                il += struct.pack(">H", iid)
            if iloc_version >= 1:
                il += struct.pack(">H", mth)  # 12 reserved + 4 bits
            il += struct.pack(">H", 0)  # data_reference_index
            if base_sz:
                il += struct.pack(">I", bval)
            il += struct.pack(">H", 1)  # extent_count
            if idx_sz:
                il += struct.pack(">I", eidx)
            il += struct.pack(">II", off, ln)
        iloc = _fullbox(b"iloc", il, version=iloc_version)
        body = hdlr + pitm + iinf + iprp + iloc
        if construction == "idat":
            body += _box(b"idat", b"".join(p for _i, _t, p in items))
        refs = b""
        if alpha_payload is not None:
            # iref v0: auxl reference alpha(2) -> primary(1)
            refs += _box(b"auxl", struct.pack(">HHH", 2, 1, 1))
        if derived_span is not None:
            # 'iloc' reference: derived(3) reads its bytes from
            # primary(1) — the construction-method-2 source list
            refs += _box(b"iloc", struct.pack(">HHH", 3, 1, 1))
        if refs:
            body += _fullbox(b"iref", refs)
        return _fullbox(b"meta", body)

    if construction == "idat":
        # idat-relative extents: no second pass needed
        offsets = []
        pos = 0
        for _iid, _t, payload in items:
            offsets.append(pos)
            pos += len(payload)
        meta = build_meta(offsets)
        return ftyp + meta

    meta0 = build_meta([0] * len(items))
    mdat_body_start = len(ftyp) + len(meta0) + 8
    offsets = []
    pos = 0 if base_offset else mdat_body_start
    for _iid, _t, payload in items:
        offsets.append(pos)
        pos += len(payload)
    meta = build_meta(offsets, base=mdat_body_start if base_offset else 0)
    if len(meta) != len(meta0):  # pragma: no cover — fixed-width offsets
        raise ValueError("meta size changed across offset resolution")
    mdat = _box(b"mdat", b"".join(p for _i, _t, p in items))
    return ftyp + meta + mdat


# ---------------------------------------------------------------------------
# census parser
# ---------------------------------------------------------------------------


def _boxes(data: bytes, lo: int, hi: int):
    p = lo
    while p + 8 <= hi:
        (size,) = struct.unpack_from(">I", data, p)
        btype = data[p + 4 : p + 8]
        body = p + 8
        if size == 1:
            if p + 16 > hi:
                raise EOFError("truncated 64-bit box size")
            (size,) = struct.unpack_from(">Q", data, p + 8)
            body = p + 16
        elif size == 0:
            size = hi - p
        if size < 8 or p + size > hi:
            raise ValueError(f"invalid box size at {p}")
        yield btype, body, p + size
        p += size
    if p != hi:
        raise ValueError("trailing bytes between boxes")


def parse_avif(data: bytes) -> dict:
    """Census walk of an AVIF/HEIF still. Returns brand, n_items,
    primary (id/type/width/height/bit_depth), has_alpha, item extents
    (id → [(offset, length)]), total_item_bytes, extents_ok (every
    extent inside mdat), bytes_walked."""
    brand = None
    meta_seen = False
    mdat_span: tuple[int, int] | None = None
    idat_span: tuple[int, int] | None = None
    iloc_version = None
    items: dict[int, str] = {}
    extents: dict[int, list[tuple[int, int]]] = {}
    ext_indexes: dict[int, list[int]] = {}
    iloc_refs: dict[int, list[int]] = {}
    methods: dict[int, int] = {}
    props: list[tuple[bytes, bytes]] = []
    assoc: dict[int, list[int]] = {}
    primary_id = None
    aux_edges: list[tuple[int, int]] = []
    handler = None
    walked = 0

    def parse_meta(lo: int, hi: int) -> None:
        nonlocal primary_id, handler, idat_span, iloc_version
        for btype, body, end in _boxes(data, lo, hi):
            if btype == b"hdlr":
                handler = data[body + 8 : body + 12].decode("ascii")
            elif btype == b"pitm":
                (primary_id,) = struct.unpack_from(">H", data, body + 4)
            elif btype == b"iinf":
                (cnt,) = struct.unpack_from(">H", data, body + 4)
                got = 0
                for itype, ibody, _iend in _boxes(data, body + 6, end):
                    if itype != b"infe":
                        raise ValueError("iinf child is not infe")
                    iid, _prot = struct.unpack_from(">HH", data, ibody + 4)
                    items[iid] = data[ibody + 8 : ibody + 12].decode("ascii")
                    got += 1
                if got != cnt:
                    raise ValueError(f"iinf declared {cnt} items, found {got}")
            elif btype == b"iprp":
                for ptype, pbody, pend in _boxes(data, body, end):
                    if ptype == b"ipco":
                        for ct, cb, ce in _boxes(data, pbody, pend):
                            props.append((ct, data[cb:ce]))
                    elif ptype == b"ipma":
                        (ecnt,) = struct.unpack_from(">I", data, pbody + 4)
                        p = pbody + 8
                        for _ in range(ecnt):
                            iid, acnt = struct.unpack_from(">HB", data, p)
                            p += 3
                            assoc[iid] = [
                                data[p + k] & 0x7F for k in range(acnt)
                            ]
                            p += acnt
            elif btype == b"idat":
                idat_span = (body, end)  # plain box: payload = body..end
            elif btype == b"iloc":
                ver = data[body]
                iloc_version = ver
                if ver > 2:
                    raise NotImplementedError(
                        f"iloc version {ver} is not parsed"
                    )
                sizes = data[body + 4]
                off_sz, len_sz = sizes >> 4, sizes & 0xF
                base_sz = data[body + 5] >> 4
                idx_sz = data[body + 5] & 0xF if ver in (1, 2) else 0
                for nm, sz in (("offset", off_sz), ("length", len_sz),
                               ("base_offset", base_sz), ("index", idx_sz)):
                    if sz not in (0, 4, 8):
                        raise ValueError(f"iloc {nm}_size {sz} invalid")

                def _field(p: int, sz: int) -> tuple[int, int]:
                    if sz == 0:
                        return 0, p
                    return (
                        int.from_bytes(data[p : p + sz], "big"),
                        p + sz,
                    )

                if ver == 2:
                    (icnt,) = struct.unpack_from(">I", data, body + 6)
                    p = body + 10
                else:
                    (icnt,) = struct.unpack_from(">H", data, body + 6)
                    p = body + 8
                for _ in range(icnt):
                    if ver == 2:
                        (iid,) = struct.unpack_from(">I", data, p)
                        p += 4
                    else:
                        (iid,) = struct.unpack_from(">H", data, p)
                        p += 2
                    method = 0
                    if ver in (1, 2):
                        (cm,) = struct.unpack_from(">H", data, p)
                        method = cm & 0xF
                        p += 2
                    if method > 2:
                        raise ValueError(
                            f"reserved iloc construction method {method}"
                        )
                    if method == 2 and idx_sz == 0:
                        raise ValueError(
                            "construction method 2 requires a nonzero "
                            "index_size"
                        )
                    (_dref,) = struct.unpack_from(">H", data, p)
                    p += 2
                    base, p = _field(p, base_sz)
                    (xcnt,) = struct.unpack_from(">H", data, p)
                    p += 2
                    exts = []
                    eidxs = []
                    for _ in range(xcnt):
                        eidx, p = _field(p, idx_sz)
                        if method == 2 and eidx == 0:
                            raise ValueError(
                                "method 2 extent_index is 1-based; 0 "
                                "is reserved"
                            )
                        if method != 2 and eidx:
                            raise ValueError(
                                "nonzero extent_index outside "
                                "construction method 2"
                            )
                        off, p = _field(p, off_sz)
                        ln, p = _field(p, len_sz)
                        exts.append((base + off, ln))
                        eidxs.append(eidx)
                    extents[iid] = exts
                    ext_indexes[iid] = eidxs
                    methods[iid] = method
            elif btype == b"iref":
                for rt, rb, _re2 in _boxes(data, body + 4, end):
                    if rt == b"auxl":
                        frm, rcnt = struct.unpack_from(">HH", data, rb)
                        for k in range(rcnt):
                            (to,) = struct.unpack_from(">H", data, rb + 4 + 2 * k)
                            aux_edges.append((frm, to))
                    elif rt == b"iloc":
                        # construction-method-2 source list: the items
                        # whose data a method-2 item's extents index
                        frm, rcnt = struct.unpack_from(">HH", data, rb)
                        iloc_refs[frm] = [
                            struct.unpack_from(">H", data, rb + 4 + 2 * k)[0]
                            for k in range(rcnt)
                        ]

    for btype, body, end in _boxes(data, 0, len(data)):
        walked += end - (body - 8)
        if btype == b"ftyp":
            brand = data[body : body + 4].decode("ascii")
        elif btype == b"meta":
            meta_seen = True
            parse_meta(body + 4, end)
        elif btype == b"mdat":
            mdat_span = (body, end)
    if brand not in ("avif", "avis", "mif1", "heic"):
        raise ValueError(f"not a HEIF/AVIF brand: {brand!r}")
    if not meta_seen or primary_id is None:
        raise ValueError("missing meta/pitm item structure")
    if handler != "pict":
        raise ValueError(f"handler {handler!r} is not pict")
    if primary_id not in items:
        raise ValueError(f"primary item {primary_id} not in iinf")

    def prop_for(iid: int, ptype: bytes) -> bytes | None:
        for idx in assoc.get(iid, []):
            if 1 <= idx <= len(props) and props[idx - 1][0] == ptype:
                return props[idx - 1][1]
        return None

    ispe = prop_for(primary_id, b"ispe")
    if ispe is None:
        raise ValueError("primary item has no ispe association")
    width, height = struct.unpack_from(">II", ispe, 4)
    pixi = prop_for(primary_id, b"pixi")
    bit_depth = pixi[5] if pixi is not None else None
    has_alpha = False
    for frm, to in aux_edges:
        aux_c = prop_for(frm, b"auxC")
        if to == primary_id and aux_c is not None:
            urn = aux_c[4:].split(b"\x00", 1)[0].decode("ascii")
            if "alpha" in urn:
                has_alpha = True
    total = 0
    extents_ok = bool(extents)

    def item_size(iid: int) -> int:
        return sum(ln for _o, ln in extents.get(iid, []))

    for iid, exts in extents.items():
        method = methods.get(iid, 0)
        if method == 2:
            # every extent indexes the data of a source item from the
            # 'iloc' reference list; the chain must terminate in a
            # stored (method 0/1) item
            refs = iloc_refs.get(iid)
            if not refs:
                raise ValueError(
                    f"method 2 item {iid} has no 'iloc' item reference"
                )
            seen = {iid}
            probe = iid
            while methods.get(probe, 0) == 2:
                srcs = iloc_refs.get(probe)
                if not srcs:
                    raise ValueError(
                        f"method 2 item {probe} has no 'iloc' reference"
                    )
                probe = srcs[0]
                if probe in seen:
                    raise ValueError(
                        "construction method 2 reference cycle"
                    )
                seen.add(probe)
            for (off, ln), eidx in zip(exts, ext_indexes.get(iid, [])):
                total += ln
                if eidx > len(refs):
                    raise ValueError(
                        f"extent_index {eidx} exceeds the {len(refs)} "
                        "'iloc' references"
                    )
                src_id = refs[eidx - 1]
                if src_id not in extents or off + ln > item_size(src_id):
                    extents_ok = False
            continue
        for off, ln in exts:
            total += ln
            if method == 1:  # idat-relative
                if idat_span is None or off + ln > (
                    idat_span[1] - idat_span[0]
                ):
                    extents_ok = False
            else:  # file offsets — must land inside mdat
                if mdat_span is None or not (
                    mdat_span[0] <= off and off + ln <= mdat_span[1]
                ):
                    extents_ok = False
    if prop_for(primary_id, b"av1C") is None:
        raise ValueError("primary item has no av1C codec configuration")
    return {
        "brand": brand,
        "n_items": len(items),
        "primary_id": primary_id,
        "primary_type": items[primary_id],
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "has_alpha": has_alpha,
        "extents": extents,
        "methods": methods,
        "iloc_version": iloc_version,
        "total_item_bytes": total,
        "extents_ok": extents_ok,
        "bytes_walked": walked,
    }

"""EBML / Matroska / WebM container census — the web's second video
container (WebM is the <video>-tag format; MKV the archival one), so a
crawl-scale media census that only reads MP4 (m16) is blind to it.

Scope (structural, spec-derivable from RFC 8794 EBML + the Matroska
element registry — no vendored tables beyond the element IDs used):

* **EBML primitives**: variable-length element IDs (leading-zero
  length marker retained, per RFC 8794 §4) and data-size VINTs
  (marker stripped; the all-ones size means "unknown"). Unknown-size
  Segment and Cluster elements — the live-stream capture shape — are
  parsed with child-boundary resync (RFC 8794 §6.2: the element ends
  at the first ID that is not a valid child); unknown size on any
  other element stays a named refusal (the Matroska profile).
* **Muxer**: EBML header (DocType webm/matroska), Segment with Info
  (TimestampScale, Duration), Tracks (video: CodecID/PixelWidth/
  PixelHeight; audio: CodecID/SamplingFrequency/Channels), Clusters
  of SimpleBlocks (keyframe flag; Xiph, EBML signed-vint-delta, and
  fixed-size lacing) and BlockGroup/Block (+BlockDuration) — every
  block shape and all three lacing modes real muxers emit.
* **Census parser**: doc type + version, timestamp scale, duration,
  per-track codec/dimensions/audio params, cluster/block/keyframe/
  lacing counts, media payload byte total, and ``bytes_walked`` so a
  caller can pin that the walk covered the whole file.

Pixel/sample decode is documented OUT of scope (VP8/VP9/Opus payload
decode — same boundary as m16's H.264 pixels and m22's SILK/CELT).

Error taxonomy matches the codec family: ``EOFError`` truncation,
``ValueError`` structural violations, ``NotImplementedError`` named
boundaries.

100 TB shape: per-payload header walk in Arrow-batched ``mapInPandas``
— no shuffle, payload bytes never leave the executor task.
"""

from __future__ import annotations

__all__ = ["encode_mkv", "parse_mkv"]

# element IDs (RFC 8794 / Matroska registry), with ID marker bits
_EBML = 0x1A45DFA3
_EBML_VERSION = 0x4286
_EBML_READ_VERSION = 0x42F7
_EBML_MAX_ID = 0x42F2
_EBML_MAX_SIZE = 0x42F3
_DOCTYPE = 0x4282
_DOCTYPE_VERSION = 0x4287
_DOCTYPE_READ_VERSION = 0x4285
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_BLOCK_DURATION = 0x9B

_MASTERS = {_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO,
            _CLUSTER, _BLOCK_GROUP}

# elements that MAY be written with the all-ones "unknown" size (the
# live-stream shape — Matroska profile restricts unknown-size to
# Segment and Cluster), and the child IDs that may follow inside each:
# an unknown-size element ends at the first element that is not a
# valid child (RFC 8794 §6.2 / Matroska resync)
_SEEK_HEAD = 0x114D9B74
_CUES = 0x1C53BB6B
_CHAPTERS = 0x1043A770
_TAGS = 0x1254C367
_ATTACHMENTS = 0x1941A469
_CLUSTER_POSITION = 0xA7
_CLUSTER_PREV_SIZE = 0xAB
_VOID = 0xEC
_CRC32 = 0xBF
_UNKNOWN_OK_CHILDREN = {
    # Void and CRC-32 are global elements real muxers emit anywhere
    # inside Segment/Cluster (ADVICE r12) — without them a resync
    # would truncate the census at the first padding element
    _SEGMENT: {
        _INFO, _TRACKS, _CLUSTER, _SEEK_HEAD, _CUES, _CHAPTERS, _TAGS,
        _ATTACHMENTS, _VOID, _CRC32,
    },
    _CLUSTER: {
        _CLUSTER_TS, _SIMPLE_BLOCK, _BLOCK_GROUP, _CLUSTER_POSITION,
        _CLUSTER_PREV_SIZE, _VOID, _CRC32,
    },
}


def _resolve_unknown_end(data: bytes, eid: int, lo: int, hi: int) -> int:
    """End position of an unknown-size ``eid`` whose body starts at
    ``lo``: scan forward element-by-element until the first ID that is
    not a valid child (or ``hi``). Nested unknown-size elements (a
    live stream's unknown Clusters inside an unknown Segment) resolve
    recursively."""
    children = _UNKNOWN_OK_CHILDREN[eid]
    pos = lo
    while pos < hi:
        cid, p = _read_vint(data, pos, keep_marker=True)
        if cid not in children:
            break
        size, p = _read_vint(data, p, keep_marker=False)
        if size >= 0:
            if p + size > hi:
                raise EOFError(
                    f"element 0x{cid:X} at {pos} overruns its parent"
                )
            pos = p + size
        else:
            if cid not in _UNKNOWN_OK_CHILDREN:
                raise NotImplementedError(
                    f"unknown-size element 0x{cid:X} is not resyncable"
                )
            pos = _resolve_unknown_end(data, cid, p, hi)
    return pos


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _encode_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _encode_size(value: int) -> bytes:
    """Data-size VINT: minimal length whose all-ones pattern (reserved
    for 'unknown') is avoided."""
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            return (value | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError(f"EBML size {value} too large")


def _el(eid: int, body: bytes) -> bytes:
    return _encode_id(eid) + _encode_size(len(body)) + body


def _uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def _encode_signed_vint(delta: int) -> bytes:
    """EBML lacing size delta: a vint whose value is biased by
    2^(7*len-1)-1 (RFC 8794 §4: signed vints store value + bias)."""
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        stored = delta + bias
        if 0 <= stored < (1 << (7 * length)) - 1:
            return (stored | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError(f"signed vint delta {delta} out of range")


def _read_signed_vint(data: bytes, pos: int) -> tuple[int, int]:
    raw, new_pos = _read_vint(data, pos, keep_marker=False)
    if raw < 0:
        raise ValueError("signed vint cannot be unknown-size")
    length = new_pos - pos
    return raw - ((1 << (7 * length - 1)) - 1), new_pos


def _read_vint(data: bytes, pos: int, *, keep_marker: bool) -> tuple[int, int]:
    """One VINT at ``pos`` → (value, new_pos). ``keep_marker`` reads an
    element ID (marker retained); otherwise a data size (marker
    stripped, all-ones → -1 = unknown)."""
    if pos >= len(data):
        raise EOFError("truncated EBML vint")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError(f"invalid EBML vint lead byte 0x00 at {pos}")
    length = 9 - b0.bit_length()
    if pos + length > len(data):
        raise EOFError("truncated EBML vint body")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length
    value = raw & ~(1 << (7 * length))
    if value == (1 << (7 * length)) - 1:
        return -1, pos + length  # unknown size
    return value, pos + length


# ---------------------------------------------------------------------------
# muxer
# ---------------------------------------------------------------------------


def encode_mkv(
    tracks: list[dict],
    clusters: list[dict],
    *,
    doc_type: str = "webm",
    doc_type_version: int = 4,
    timestamp_scale: int = 1_000_000,
    duration_ms: float | None = None,
    unknown_size: str | None = None,
) -> bytes:
    """Serialize a Matroska/WebM file.

    ``tracks``: dicts with ``number``, ``type`` ("video"/"audio"),
    ``codec_id``, and ``width``/``height`` or ``sampling``/``channels``.
    ``clusters``: dicts with ``timestamp`` and ``blocks`` — each block a
    dict with ``track``, ``offset`` (relative ts), and either
    ``frame`` (bytes; ``keyframe`` bool; SimpleBlock), ``frames``
    (list of bytes; Xiph-laced SimpleBlock), or ``group_frame``
    (bytes; BlockGroup/Block with ``duration``).
    ``unknown_size``: ``"segment"`` writes the Segment with the
    all-ones size (the live-stream shape); ``"segment+clusters"``
    additionally writes every Cluster unknown-size (resynced at the
    next Cluster / end of stream)."""
    if unknown_size not in (None, "segment", "segment+clusters"):
        raise ValueError(f"unknown_size {unknown_size!r} not a valid form")
    head = _el(
        _EBML,
        _el(_EBML_VERSION, _uint(1))
        + _el(_EBML_READ_VERSION, _uint(1))
        + _el(_EBML_MAX_ID, _uint(4))
        + _el(_EBML_MAX_SIZE, _uint(8))
        + _el(_DOCTYPE, doc_type.encode("ascii"))
        + _el(_DOCTYPE_VERSION, _uint(doc_type_version))
        + _el(_DOCTYPE_READ_VERSION, _uint(2)),
    )
    info = _el(_TIMESTAMP_SCALE, _uint(timestamp_scale))
    if duration_ms is not None:
        import struct

        info += _el(_DURATION, struct.pack(">d", float(duration_ms)))
    info += _el(_MUXING_APP, b"tectonic-spark") + _el(
        _WRITING_APP, b"tectonic-spark"
    )
    tr = b""
    for t in tracks:
        body = (
            _el(_TRACK_NUMBER, _uint(t["number"]))
            + _el(_TRACK_UID, _uint(t.get("uid", t["number"])))
            + _el(_TRACK_TYPE, _uint(1 if t["type"] == "video" else 2))
            + _el(_CODEC_ID, t["codec_id"].encode("ascii"))
        )
        if t["type"] == "video":
            body += _el(
                _VIDEO,
                _el(_PIXEL_WIDTH, _uint(t["width"]))
                + _el(_PIXEL_HEIGHT, _uint(t["height"])),
            )
        else:
            import struct

            body += _el(
                _AUDIO,
                _el(_SAMPLING_FREQ, struct.pack(">d", float(t["sampling"])))
                + _el(_CHANNELS, _uint(t["channels"])),
            )
        tr += _el(_TRACK_ENTRY, body)
    seg_body = _el(_INFO, info) + _el(_TRACKS, tr)
    for c in clusters:
        cb = _el(_CLUSTER_TS, _uint(c["timestamp"]))
        for blk in c["blocks"]:
            tn = _encode_size(blk["track"])  # track number is a VINT
            off = int(blk.get("offset", 0)).to_bytes(2, "big", signed=True)
            if "frames" in blk:  # Xiph-laced SimpleBlock
                frames = blk["frames"]
                flags = 0x80 | 0x02  # keyframe + Xiph lacing
                lace = bytes([len(frames) - 1])
                for fr in frames[:-1]:
                    n = len(fr)
                    lace += b"\xff" * (n // 255) + bytes([n % 255])
                body = tn + off + bytes([flags]) + lace + b"".join(frames)
                cb += _el(_SIMPLE_BLOCK, body)
            elif "frames_ebml" in blk:  # EBML-laced SimpleBlock
                frames = blk["frames_ebml"]
                flags = 0x80 | 0x06  # keyframe + EBML lacing
                lace = bytes([len(frames) - 1])
                if len(frames) > 1:  # sizes cover all but the last frame
                    lace += _encode_size(len(frames[0]))
                    prev = len(frames[0])
                    for fr in frames[1:-1]:
                        lace += _encode_signed_vint(len(fr) - prev)
                        prev = len(fr)
                body = tn + off + bytes([flags]) + lace + b"".join(frames)
                cb += _el(_SIMPLE_BLOCK, body)
            elif "frames_fixed" in blk:  # fixed-size lacing
                frames = blk["frames_fixed"]
                if len({len(fr) for fr in frames}) != 1:
                    raise ValueError("fixed lacing needs equal frame sizes")
                flags = 0x80 | 0x04  # keyframe + fixed lacing
                body = (
                    tn + off + bytes([flags]) + bytes([len(frames) - 1])
                    + b"".join(frames)
                )
                cb += _el(_SIMPLE_BLOCK, body)
            elif "group_frame" in blk:  # BlockGroup/Block
                body = tn + off + bytes([0]) + blk["group_frame"]
                grp = _el(_BLOCK, body) + _el(
                    _BLOCK_DURATION, _uint(blk.get("duration", 20))
                )
                cb += _el(_BLOCK_GROUP, grp)
            else:
                flags = 0x80 if blk.get("keyframe") else 0x00
                body = tn + off + bytes([flags]) + blk["frame"]
                cb += _el(_SIMPLE_BLOCK, body)
        if unknown_size == "segment+clusters":
            seg_body += _encode_id(_CLUSTER) + b"\xff" + cb
        else:
            seg_body += _el(_CLUSTER, cb)
    if unknown_size is not None:
        return head + _encode_id(_SEGMENT) + b"\xff" + seg_body
    return head + _el(_SEGMENT, seg_body)


# ---------------------------------------------------------------------------
# census parser
# ---------------------------------------------------------------------------


def _parse_block(body: bytes, *, simple: bool, keep_frames: bool = False) -> dict:
    """A (Simple)Block body → {track, offset, keyframe, lacing,
    n_frames, media_bytes[, frames]}. All three lacing modes unpack:
    Xiph 255-spill size runs, EBML signed-vint deltas, fixed
    equal-split. ``keep_frames`` additionally materializes the frame
    payloads (off by default — the census never copies media bytes)."""
    track, pos = _read_vint(body, 0, keep_marker=False)
    if track < 0:
        raise ValueError("block track number cannot be unknown-size")
    if pos + 3 > len(body):
        raise EOFError("truncated block header")
    offset = int.from_bytes(body[pos : pos + 2], "big", signed=True)
    flags = body[pos + 2]
    pos += 3
    lacing = (flags >> 1) & 0x3
    keyframe = bool(flags & 0x80) if simple else False
    sizes: list[int] | None = None  # explicit sizes for all but last frame
    if lacing == 0:
        lace_name, n_frames = "none", 1
    else:
        if pos >= len(body):
            raise EOFError("truncated lace count")
        n_frames = body[pos] + 1
        pos += 1
        if lacing == 1:  # Xiph: 255-spill size runs
            lace_name = "xiph"
            sizes = []
            for _ in range(n_frames - 1):
                size = 0
                while True:
                    if pos >= len(body):
                        raise EOFError("truncated Xiph lace size")
                    b = body[pos]
                    pos += 1
                    size += b
                    if b != 255:
                        break
                sizes.append(size)
        elif lacing == 2:  # fixed-size: no table, payload divides evenly
            lace_name = "fixed"
            if (len(body) - pos) % n_frames:
                raise ValueError("fixed lacing: payload does not divide evenly")
            each = (len(body) - pos) // n_frames
            sizes = [each] * (n_frames - 1)
        else:  # EBML: first size a plain vint, then signed-vint deltas
            # (sizes cover all but the last frame — 1-frame blocks none)
            lace_name = "ebml"
            if n_frames > 1:
                first, pos = _read_vint(body, pos, keep_marker=False)
                if first < 0:
                    raise ValueError("EBML lace size cannot be unknown")
                sizes = [first]
                for _ in range(n_frames - 2):
                    delta, pos = _read_signed_vint(body, pos)
                    sizes.append(sizes[-1] + delta)
                    if sizes[-1] < 0:
                        raise ValueError(
                            "EBML lace delta drives a negative size"
                        )
            else:
                sizes = []
        if sum(sizes) > len(body) - pos:
            raise ValueError(f"{lace_name} lace sizes overrun block")
    out = {
        "track": track,
        "offset": offset,
        "keyframe": keyframe,
        "lacing": lace_name,
        "n_frames": n_frames,
        "media_bytes": len(body) - pos,
    }
    if keep_frames:
        frames = []
        fp = pos
        for s in sizes or []:
            frames.append(body[fp : fp + s])
            fp += s
        frames.append(body[fp:])  # last frame: the remainder
        out["frames"] = frames
    return out


def parse_mkv(data: bytes, *, keep_frames: bool = False) -> dict:
    """Census walk of a Matroska/WebM file. Returns doc_type,
    doc_type_version, timestamp_scale, duration_ms (int, None if
    absent), tracks (list: number/type/codec_id + dims or audio
    params), n_clusters, n_blocks, n_block_groups, n_keyframes,
    n_frames, n_laced_blocks, media_bytes, bytes_walked.
    ``keep_frames=True`` additionally returns ``frames`` as
    ``[(track, frame_bytes), ...]`` in stream order — what a
    cross-container comparison or a downstream packet decoder needs;
    off by default so the census never copies media bytes."""
    out: dict = {
        "doc_type": None,
        "doc_type_version": None,
        "timestamp_scale": 1_000_000,
        "duration_ms": None,
        "tracks": [],
        "n_clusters": 0,
        "n_blocks": 0,
        "n_block_groups": 0,
        "n_keyframes": 0,
        "n_frames": 0,
        "n_laced_blocks": 0,
        "media_bytes": 0,
    }
    if keep_frames:
        out["frames"] = []

    def walk(lo: int, hi: int, depth: int, ctx: str) -> int:
        pos = lo
        while pos < hi:
            eid, p = _read_vint(data, pos, keep_marker=True)
            size, p = _read_vint(data, p, keep_marker=False)
            if size < 0:
                if eid not in _UNKNOWN_OK_CHILDREN:
                    raise NotImplementedError(
                        f"unknown-size 0x{eid:X} is not parsed (only "
                        "Segment and Cluster may omit their size)"
                    )
                # live-stream shape: resync on the first non-child
                body_lo = p
                body_hi = _resolve_unknown_end(data, eid, p, hi)
            else:
                if p + size > hi:
                    raise EOFError(
                        f"element 0x{eid:X} at {pos} overruns its parent"
                    )
                body_lo, body_hi = p, p + size
            if eid == _DOCTYPE:
                out["doc_type"] = data[body_lo:body_hi].decode("ascii")
            elif eid == _DOCTYPE_VERSION:
                out["doc_type_version"] = int.from_bytes(
                    data[body_lo:body_hi], "big"
                )
            elif eid == _TIMESTAMP_SCALE:
                out["timestamp_scale"] = int.from_bytes(
                    data[body_lo:body_hi], "big"
                )
            elif eid == _DURATION:
                import struct

                fmt = ">d" if size == 8 else ">f"
                out["duration_ms"] = int(
                    struct.unpack(fmt, data[body_lo:body_hi])[0]
                )
            elif eid == _TRACK_ENTRY:
                out["tracks"].append(_parse_track(data, body_lo, body_hi))
                pos = body_hi
                continue
            elif eid == _CLUSTER:
                out["n_clusters"] += 1
            elif eid == _SIMPLE_BLOCK:
                blk = _parse_block(
                    data[body_lo:body_hi], simple=True, keep_frames=keep_frames
                )
                out["n_blocks"] += 1
                out["n_frames"] += blk["n_frames"]
                out["media_bytes"] += blk["media_bytes"]
                if blk["keyframe"]:
                    out["n_keyframes"] += 1
                if blk["lacing"] != "none":
                    out["n_laced_blocks"] += 1
                if keep_frames:
                    out["frames"].extend(
                        (blk["track"], fr) for fr in blk["frames"]
                    )
            elif eid == _BLOCK_GROUP:
                out["n_block_groups"] += 1
            elif eid == _BLOCK:
                blk = _parse_block(
                    data[body_lo:body_hi], simple=False, keep_frames=keep_frames
                )
                out["n_blocks"] += 1
                out["n_frames"] += blk["n_frames"]
                out["media_bytes"] += blk["media_bytes"]
                if keep_frames:
                    out["frames"].extend(
                        (blk["track"], fr) for fr in blk["frames"]
                    )
            if eid in _MASTERS:
                walked = walk(body_lo, body_hi, depth + 1, f"0x{eid:X}")
                if walked != body_hi:  # pragma: no cover — loop invariant
                    raise ValueError(f"master 0x{eid:X} walk stopped early")
            pos = body_hi
        return pos

    if not data.startswith(_encode_id(_EBML)):
        raise ValueError("not an EBML stream (no 0x1A45DFA3 header)")
    end = walk(0, len(data), 0, "root")
    if out["doc_type"] not in ("webm", "matroska"):
        raise ValueError(f"unsupported DocType {out['doc_type']!r}")
    # accumulated from consumed element extents, NOT len(data): a caller
    # comparing against the payload length pins full-file coverage
    out["bytes_walked"] = end
    return out


def _parse_track(data: bytes, lo: int, hi: int) -> dict:
    t: dict = {
        "number": None,
        "type": None,
        "codec_id": None,
        "width": None,
        "height": None,
        "sampling": None,
        "channels": None,
    }
    pos = lo
    while pos < hi:
        eid, p = _read_vint(data, pos, keep_marker=True)
        size, p = _read_vint(data, p, keep_marker=False)
        if size < 0 or p + size > hi:
            raise EOFError("truncated TrackEntry")
        body = data[p : p + size]
        if eid == _TRACK_NUMBER:
            t["number"] = int.from_bytes(body, "big")
        elif eid == _TRACK_TYPE:
            v = int.from_bytes(body, "big")
            t["type"] = {1: "video", 2: "audio"}.get(v, f"type{v}")
        elif eid == _CODEC_ID:
            t["codec_id"] = body.decode("ascii")
        elif eid == _PIXEL_WIDTH:
            t["width"] = int.from_bytes(body, "big")
        elif eid == _PIXEL_HEIGHT:
            t["height"] = int.from_bytes(body, "big")
        elif eid == _SAMPLING_FREQ:
            import struct

            t["sampling"] = struct.unpack(">d" if size == 8 else ">f", body)[0]
        elif eid == _CHANNELS:
            t["channels"] = int.from_bytes(body, "big")
        elif eid in (_VIDEO, _AUDIO):
            pos = p
            continue  # descend into the master element
        pos = p + size
    return t

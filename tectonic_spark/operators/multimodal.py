"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata
(north-star extension; no reference analog — the reference stops at byte
parsing, SURVEY §2.A).

Design for 100 TB:

* Payloads are **opaque ``binary`` columns** with a sibling metadata struct
  — the layout a real lakehouse uses (parquet BYTE_ARRAY chunks stay
  columnar; metadata prunes without touching payload bytes).
* Decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** stages: one Python worker per partition-batch, payload
  bytes never pass through the driver, batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
* Six REAL formats decode natively: uncompressed **BMP**, PCM **WAV**,
  **Y4M** video (r4, :mod:`tectonic_spark.operators.codecs`), compressed
  baseline **JPEG** (r5, :mod:`tectonic_spark.operators.jpeg`: huffman
  entropy decode, dequant, exact-float IDCT, chroma upsample,
  YCbCr→RGB), and — r6 — compressed audio: **FLAC** to exact PCM
  (:mod:`tectonic_spark.operators.flac`, lossless + CRC/MD5-verified)
  and **MP3** at frame/metadata level (``codecs.parse_mp3``; sample
  synthesis needs the ISO 11172-3 Annex-B constant tables, which cannot
  be vendored from memory without mistranscription risk — soundfile
  territory). m01/m03/m05/m08/m10/m12 run over actual format bytes
  under the oracle gate. H.264 decodes at NAL/frame-census level (r7,
  ``h264.parse_h264`` — SPS resolution, frame/IDR counts, extents);
  PIXEL decode of compressed video routes to pyav in a production build
  without touching the mapInPandas plumbing. ``fake=True`` (TMM1
  header parser, kept for m02/m04) exercises the same schema/batch
  shapes with synthetic payloads.

The synthetic payload format (``_fake_payload``) is deterministic from the
documents table, so every derived quantity is reproducible in ANSI SQL for
the DuckDB oracle (m01/m02 in the registry).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"TMM1"  # tectonic multimodal v1


def _fake_payload(doc_id: int, n_chars: int, kind: str) -> bytes:
    """Deterministic synthetic payload: 4-byte magic, kind byte, width,
    height, n_frames (little-endian u32) + (n_chars % 251) filler bytes.
    Every field derives from (doc_id, n_chars) so DuckDB can reproduce it.
    """
    kind_b = {"image": 0, "audio": 1, "video": 2}[kind]
    width = 64 + (doc_id % 16) * 32
    height = 64 + (doc_id % 9) * 32
    n_frames = 1 if kind == "image" else 1 + (doc_id % 240)
    body = bytes([(doc_id + i) % 256 for i in range(n_chars % 251)])
    return (
        _MAGIC
        + bytes([kind_b])
        + struct.pack("<III", width, height, n_frames)
        + body
    )


def attach_fake_payloads(docs: DataFrame) -> DataFrame:
    """documents → add ``media`` binary + ``media_kind`` columns (the
    ingest shape: payload opaque, kind from metadata). Pure mapInPandas so
    payload synthesis is distributed and Arrow-batched."""
    schema = StructType(
        list(docs.schema.fields)
        + [
            StructField("media", BinaryType(), True),
            StructField("media_kind", StringType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            kind = [kinds[i % 3] for i in pdf["doc_id"]]
            pdf = pdf.assign(
                media=[
                    _fake_payload(i, n, k)
                    for i, n, k in zip(pdf["doc_id"], pdf["n_chars"], kind)
                ],
                media_kind=kind,
            )
            yield pdf

    return docs.mapInPandas(gen, schema)


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_kind", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("payload_bytes", LongType(), True),
    ]
)


def _decode_image_real(payload: bytes):
    """Real decode dispatch: BMP / WAV / Y4M payloads decode natively via
    the vendored pure-Python codecs (:mod:`tectonic_spark.operators.codecs`);
    baseline JPEG decodes via :mod:`tectonic_spark.operators.jpeg` (r5);
    compressed audio decodes natively too (r6) — FLAC to exact PCM via
    :mod:`tectonic_spark.operators.flac`, MP3 at frame/metadata level via
    ``codecs.parse_mp3`` (sample synthesis needs the ISO Annex-B constant
    tables and routes to soundfile in a production build). H.264 decodes
    at NAL/frame-census level (r7, ``h264.parse_h264``); compressed-video
    PIXEL decode is pyav territory, reachable without touching the
    mapInPandas plumbing.

    → ``(kind, width, height, n_frames)``; audio reports its sample count
    as ``n_frames`` and NULL dimensions.
    """
    from tectonic_spark.operators import codecs

    if payload[:2] == b"BM":
        w, h, _px = codecs.decode_bmp(payload)
        return "image", w, h, 1
    if payload[:2] == b"\xff\xd8":  # JPEG SOI (r5: vendored baseline codec)
        from tectonic_spark.operators.jpeg import decode_jpeg

        px = decode_jpeg(payload)
        return "image", px.shape[1], px.shape[0], 1
    if payload[:8] == b"\x89PNG\r\n\x1a\n":  # r9: vendored PNG codec
        from tectonic_spark.operators.png import decode_png

        px = decode_png(payload)
        return "image", px.shape[1], px.shape[0], 1
    if payload[:6] in (b"GIF87a", b"GIF89a"):  # r9: vendored GIF codec
        from tectonic_spark.operators.gif import decode_gif

        info = decode_gif(payload)
        return "image", info["width"], info["height"], len(info["frames"])
    if payload[:2] in (b"II", b"MM") and len(payload) > 4 and payload[2:4] in (
        b"\x2a\x00",
        b"\x00\x2a",
    ):  # r9: vendored baseline TIFF codec
        from tectonic_spark.operators.tiff import decode_tiff

        px = decode_tiff(payload)
        return "image", px.shape[1], px.shape[0], 1
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        # r10: vendored WebP codec — VP8L decodes to pixels; lossy VP8
        # surfaces census dims (pixel decode documented out)
        from tectonic_spark.operators.webp import decode_webp, parse_webp

        info = parse_webp(payload)
        if info["format"] == "lossless":
            px = decode_webp(payload)
            return "image", px.shape[1], px.shape[0], 1
        return "image", info["width"], info["height"], max(info["n_frames"], 1)
    if payload[:4] == b"RIFF":
        _rate, samples = codecs.decode_wav(payload)
        return "audio", None, None, len(samples)
    if payload[:4] == b"OggS":  # r10: Ogg page walk + Opus/Vorbis census
        from tectonic_spark.operators.ogg import parse_ogg

        info = parse_ogg(payload)
        s0 = info["streams"][0] if info["streams"] else None
        dur = (s0 or {}).get("duration_samples")
        return "audio", None, None, dur if dur is not None else 0
    if payload[:4] == b"fLaC":  # r6: vendored lossless decoder, exact PCM
        from tectonic_spark.operators.flac import decode_flac

        _rate, pcm = decode_flac(payload)
        return "audio", None, None, pcm.shape[0]
    if payload[:3] == b"ID3" or (
        len(payload) > 1 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):  # r6: MPEG audio frame walk (metadata-level decode)
        info = codecs.parse_mp3(payload)
        return "audio", None, None, info["total_samples"]
    if payload[:10] == codecs._Y4M_MAGIC:
        w, h, frames = codecs.decode_y4m(payload)
        return "video", w, h, len(frames)
    if payload[:4] == b"\x00\x00\x00\x01" or payload[:3] == b"\x00\x00\x01":
        # r7: H.264 Annex-B structural census (NAL walk + SPS resolution)
        from tectonic_spark.operators.h264 import parse_h264

        info = parse_h264(payload)
        return "video", info["width"], info["height"], info["n_frames"]
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        # r8: MP4/AVCC container walk (box tree -> avcC -> length-prefixed
        # NAL census) — the dominant real-video container
        from tectonic_spark.operators.h264 import parse_mp4

        info = parse_mp4(payload)
        return "video", info["width"], info["height"], info["n_frames"]
    if payload[:5] == b"%PDF-":  # r10: document format — page census
        from tectonic_spark.operators.pdf import parse_pdf

        info = parse_pdf(payload)
        return "document", None, None, info["n_pages"]
    if payload[:4] == b"PK\x03\x04":  # r10: archive — member census
        from tectonic_spark.operators.archive import parse_zip

        return "archive", None, None, len(parse_zip(payload))
    raise NotImplementedError(
        f"no native codec for payload magic {payload[:4]!r}; "
        "plug pyav for compressed-video PIXEL decode (H.264 structural "
        "census is native — h264.parse_h264)"
    )


def _real_payload(doc_id: int, n_chars: int, kind: str) -> bytes:
    """Deterministic REAL-format payload: BMP (image), WAV (audio), Y4M
    (video). Content bytes derive from (doc_id, n_chars) exactly like the
    TMM1 fake, so every decoded quantity stays DuckDB-expressible."""
    from tectonic_spark.operators import codecs

    if kind == "image":
        w = 8 + (doc_id % 16) * 4
        h = 8 + (doc_id % 9) * 4
        px = bytes((doc_id + i) % 256 for i in range(w * h * 3))
        return codecs.encode_bmp(w, h, px)
    if kind == "audio":
        n = n_chars % 251
        return codecs.encode_wav(bytes((doc_id + i) % 256 for i in range(n)))
    w = 8 + (doc_id % 3) * 4  # 8/12/16 — even, 4:2:0-safe
    h = 8 + (doc_id % 2) * 4  # 8/12
    fb = codecs.frame_bytes_420(w, h)
    frames = [
        bytes((doc_id + f + j) % 256 for j in range(fb))
        for f in range(1 + doc_id % 12)
    ]
    return codecs.encode_y4m(w, h, frames)


def attach_real_payloads(docs: DataFrame) -> DataFrame:
    """documents → real BMP/WAV/Y4M payload per row (kind = doc_id % 3,
    same assignment as the fake path). Arrow-batched mapInPandas."""
    schema = StructType(
        list(docs.schema.fields)
        + [
            StructField("media", BinaryType(), True),
            StructField("media_kind", StringType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            kind = [kinds[i % 3] for i in pdf["doc_id"]]
            pdf = pdf.assign(
                media=[
                    _real_payload(i, n, k)
                    for i, n, k in zip(pdf["doc_id"], pdf["n_chars"], kind)
                ],
                media_kind=kind,
            )
            yield pdf

    return docs.mapInPandas(gen, schema)


def extract_media_meta(with_media: DataFrame, fake: bool = True) -> DataFrame:
    """Parse payload headers into a typed metadata frame (decode stage).

    ``fake=True`` parses the deterministic TMM1 header; ``fake=False``
    routes to the real-codec stub. Arrow-batched; only the binary column
    and doc_id are shipped into Python (select narrow first — column
    pruning keeps payload siblings out of the exchange).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["media_kind"], pdf["media"]
            ):
                if not fake:
                    # real path: full decode of actual BMP/WAV/Y4M bytes
                    k, width, height, n_frames = _decode_image_real(payload)
                    out.append((doc_id, k, width, height, n_frames, len(payload)))
                    continue
                if payload is None or payload[:4] != _MAGIC:
                    out.append((doc_id, kind, None, None, None, None))
                    continue
                width, height, n_frames = struct.unpack("<III", payload[5:17])
                out.append((doc_id, kind, width, height, n_frames, len(payload)))
            yield pd.DataFrame(
                out, columns=[f.name for f in _META_SCHEMA.fields]
            )

    return with_media.select("doc_id", "media_kind", "media").mapInPandas(
        decode, _META_SCHEMA
    )


def sample_frames(with_media: DataFrame, every_nth: int = 30, fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    (row-explosion stage). At scale this is the fan-out step before
    per-frame feature extraction; output partitioning inherits the input's,
    so repartition downstream if frame counts are skewed."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("frame_idx", LongType(), True),
            StructField("frame", BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["media_kind"], pdf["media"]
            ):
                if kind != "video" or payload is None or payload[:4] != _MAGIC:
                    continue
                if not fake:
                    _decode_image_real(payload)
                (n_frames,) = struct.unpack("<I", payload[13:17])
                for idx in range(0, n_frames, every_nth):
                    # fake "frame": header + index (deterministic, tiny)
                    rows.append((doc_id, idx, payload[:17] + struct.pack("<I", idx)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return with_media.select("doc_id", "media_kind", "media").mapInPandas(sample, schema)


# ------------------------------------------------------------------ queries


from tectonic_spark.operators.registry import REGISTRY as _REG  # noqa: E402
from tectonic_spark.operators.registry import register  # noqa: E402
from tectonic_spark.tables import spread_small_scan, table  # noqa: E402


@register(
    "m01_media_metadata",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
           CASE doc_id % 3
             WHEN 0 THEN 8 + (doc_id % 16) * 4
             WHEN 2 THEN 8 + (doc_id % 3) * 4
           END AS width,
           CASE doc_id % 3
             WHEN 0 THEN 8 + (doc_id % 9) * 4
             WHEN 2 THEN 8 + (doc_id % 2) * 4
           END AS height,
           CASE doc_id % 3
             WHEN 0 THEN 1
             WHEN 1 THEN n_chars % 251
             ELSE 1 + doc_id % 12
           END AS n_frames,
           CASE doc_id % 3
             -- BMP: 54-byte headers + 4-byte-padded BGR rows
             WHEN 0 THEN 54 + (((8 + (doc_id % 16) * 4) * 3 + 3) // 4 * 4) * (8 + (doc_id % 9) * 4)
             -- WAV: 44-byte RIFF/fmt/data headers + u8 samples
             WHEN 1 THEN 44 + n_chars % 251
             -- Y4M: text header (28 + digits of W and H) + per-frame FRAME\\n + 4:2:0 planes
             ELSE 28 + length(CAST(8 + (doc_id % 3) * 4 AS VARCHAR))
                     + length(CAST(8 + (doc_id % 2) * 4 AS VARCHAR))
                  + (1 + doc_id % 12)
                    * (6 + (8 + (doc_id % 3) * 4) * (8 + (doc_id % 2) * 4) * 3 // 2)
           END AS payload_bytes
    FROM documents
    """,
    doc="REAL media decode (VERDICT r3 item 2): payloads are actual BMP / "
    "WAV / Y4M bytes built by the vendored pure-Python codecs; "
    "fake=False fully decodes them (pixel rows, RIFF chunk walk, Y4M "
    "frame split) inside Arrow-batched mapInPandas. The oracle recomputes "
    "each format's exact byte layout — 54-byte BMP headers + padded rows, "
    "44-byte WAV headers + samples, Y4M text header + FRAME markers.",
)
def m01_media_metadata(spark, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return extract_media_meta(attach_real_payloads(docs), fake=False).select(
        "doc_id", "media_kind", "width", "height", "n_frames", "payload_bytes"
    )


@register(
    "m02_frame_sampling",
    oracle=(
        "WITH v AS (SELECT doc_id, 1 + (doc_id % 240) AS n_frames FROM documents "
        "WHERE doc_id % 3 = 2), "
        "idx AS (SELECT (g - 1) * 30 AS frame_idx FROM generate_series(1, 8) AS t(g)) "
        "SELECT v.doc_id, idx.frame_idx, CAST(21 AS BIGINT) AS frame_bytes "
        "FROM v JOIN idx ON idx.frame_idx < v.n_frames"
    ),
    doc="Per-frame fan-out: sample every 30th frame of each video payload "
    "(mapInPandas row explosion; the pre-feature-extraction step).",
)
def m02_frame_sampling(spark, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    frames = sample_frames(attach_fake_payloads(docs), every_nth=30)
    return frames.select(
        "doc_id", "frame_idx", F.length("frame").cast("long").alias("frame_bytes")
    )


def resize_media(with_media: DataFrame, max_side: int = 128, fake: bool = True) -> DataFrame:
    """Resize stage: clamp the longer side to ``max_side`` preserving
    aspect (integer floor). STUBBED decode — the fake path rewrites the
    TMM1 header dims and truncates the body proportionally, so the
    resize arithmetic and the mapInPandas plumbing are real and
    oracle-checkable; a production build decodes + rescales here."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("media", BinaryType(), True),
        ]
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                if payload is None or payload[:4] != _MAGIC:
                    out.append((doc_id, None, None, None))
                    continue
                if not fake:
                    _decode_image_real(payload)
                w, h, nf = struct.unpack("<III", payload[5:17])
                scale_num, scale_den = (max_side, max(w, h)) if max(w, h) > max_side else (1, 1)
                nw, nh = w * scale_num // scale_den, h * scale_num // scale_den
                body = payload[17:]
                keep = len(body) * scale_num // scale_den
                new_payload = payload[:5] + struct.pack("<III", nw, nh, nf) + body[:keep]
                out.append((doc_id, nw, nh, new_payload))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "media"])

    return with_media.select("doc_id", "media").mapInPandas(rs, schema)


def extract_features(with_media: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Feature extraction stage: payload → float vector. STUBBED model —
    the fake path emits deterministic byte-derived features (mean of body
    byte values per stride), keeping the vectorized plumbing and output
    schema (array<double>) real; a production build runs the encoder here."""
    from pyspark.sql.types import ArrayType, DoubleType

    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def fx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                if payload is None or payload[:4] != _MAGIC:
                    out.append((doc_id, None))
                    continue
                if not fake:
                    _decode_image_real(payload)
                body = payload[17:]
                feats = []
                for k in range(dim):
                    sl = body[k::dim]
                    feats.append(float(sum(sl)) / len(sl) if sl else 0.0)
                out.append((doc_id, feats))
            yield pd.DataFrame(out, columns=["doc_id", "features"])

    return with_media.select("doc_id", "media").mapInPandas(fx, schema)


def resize_images_real(with_media: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL image resize: decode BMP pixels, nearest-neighbor sample,
    re-encode — a full decode→transform→encode pass over actual image
    bytes inside Arrow-batched mapInPandas (non-BMP kinds are filtered
    upstream by media_kind; compressed profiles raise in the codec)."""
    from tectonic_spark.operators import codecs

    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("media", BinaryType(), True),
        ]
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                w, h, _px = codecs.decode_bmp(payload)
                if max(w, h) > max_side:
                    nw = w * max_side // max(w, h)
                    nh = h * max_side // max(w, h)
                else:
                    nw, nh = w, h
                resized = codecs.resize_bmp_nearest(payload, nw, nh)
                out.append((doc_id, nw, nh, resized))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height", "media"])

    return with_media.filter(F.col("media_kind") == "image").select(
        "doc_id", "media"
    ).mapInPandas(rs, schema)


@register(
    "m03_resize",
    oracle="""
    WITH m AS (SELECT doc_id,
                      8 + (doc_id % 16) * 4 AS w,
                      8 + (doc_id % 9) * 4 AS h
               FROM documents WHERE doc_id % 3 = 0),
    r AS (SELECT doc_id,
                 CASE WHEN greatest(w, h) > 32 THEN (w * 32) // greatest(w, h) ELSE w END AS width,
                 CASE WHEN greatest(w, h) > 32 THEN (h * 32) // greatest(w, h) ELSE h END AS height
          FROM m)
    SELECT doc_id, width, height,
           54 + ((width * 3 + 3) // 4 * 4) * height AS payload_bytes
    FROM r
    """,
    doc="REAL image resize (VERDICT r3 item 2): decode actual BMP pixel "
    "rows, nearest-neighbor resample to max side 32 preserving aspect, "
    "re-encode. The oracle checks the resize arithmetic AND the re-encoded "
    "BMP byte layout (the output payload is a valid BMP any viewer opens).",
)
def m03_resize(spark, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    resized = resize_images_real(attach_real_payloads(docs), max_side=32)
    return resized.select(
        "doc_id", "width", "height", F.length("media").cast("long").alias("payload_bytes")
    )


@register(
    "m04_feature_extract",
    oracle="""
    WITH m AS (SELECT doc_id, n_chars % 251 AS blen FROM documents)
    SELECT doc_id,
           CASE WHEN blen > 0 THEN CAST(list_sum(list_transform(range(0, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(0, blen, 8)) ELSE 0.0 END AS f0,
           CASE WHEN blen > 1 THEN CAST(list_sum(list_transform(range(1, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(1, blen, 8)) ELSE 0.0 END AS f1,
           CASE WHEN blen > 2 THEN CAST(list_sum(list_transform(range(2, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(2, blen, 8)) ELSE 0.0 END AS f2,
           CASE WHEN blen > 3 THEN CAST(list_sum(list_transform(range(3, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(3, blen, 8)) ELSE 0.0 END AS f3,
           CASE WHEN blen > 4 THEN CAST(list_sum(list_transform(range(4, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(4, blen, 8)) ELSE 0.0 END AS f4,
           CASE WHEN blen > 5 THEN CAST(list_sum(list_transform(range(5, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(5, blen, 8)) ELSE 0.0 END AS f5,
           CASE WHEN blen > 6 THEN CAST(list_sum(list_transform(range(6, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(6, blen, 8)) ELSE 0.0 END AS f6,
           CASE WHEN blen > 7 THEN CAST(list_sum(list_transform(range(7, blen, 8), j -> (doc_id + j) % 256)) AS DOUBLE) / len(range(7, blen, 8)) ELSE 0.0 END AS f7
    FROM m
    """,
    doc="Feature-extraction stage over binary media (encoder stubbed with "
    "deterministic byte statistics; array<double> plumbing, Arrow-batched "
    "mapInPandas, exact oracle on the byte arithmetic).",
)
def m04_feature_extract(spark, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    feats = extract_features(attach_fake_payloads(docs), dim=8)
    return feats.select(
        "doc_id",
        *[F.element_at("features", k + 1).alias(f"f{k}".format(k=k)) for k in range(8)],
    )



_AUDIO_WIN = 64  # samples per analysis window


def audio_window_stats(
    with_media: DataFrame, win: int = _AUDIO_WIN, fake: bool = True
) -> DataFrame:
    """Audio analysis shape: PCM samples → fixed-size windows → per-window
    features (count / sum / max). One output row per (doc, window); numpy
    does the windowed reductions per Arrow batch. ``fake=False`` decodes a
    REAL WAV payload (RIFF chunk walk) for its samples; ``fake=True``
    reads the TMM1 byte body."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("window_id", LongType(), True),
            StructField("n_samples", LongType(), True),
            StructField("sum_amp", LongType(), True),
            StructField("max_amp", LongType(), True),
        ]
    )

    def wstats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tectonic_spark.operators import codecs

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "window_id", "n_samples", "sum_amp", "max_amp")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                if fake:
                    body = np.frombuffer(payload, dtype=np.uint8)[17:].astype(np.int64)
                else:
                    _rate, samples = codecs.decode_wav(payload)
                    body = np.frombuffer(samples, dtype=np.uint8).astype(np.int64)
                for w0 in range(0, len(body), win):
                    chunk = body[w0 : w0 + win]
                    rows["doc_id"].append(doc_id)
                    rows["window_id"].append(w0 // win)
                    rows["n_samples"].append(len(chunk))
                    rows["sum_amp"].append(int(chunk.sum()))
                    rows["max_amp"].append(int(chunk.max()))
            yield pd.DataFrame(rows)

    return with_media.filter(F.col("media_kind") == "audio").mapInPandas(
        wstats, out_schema
    )


@register(
    "m05_audio_window_stats",
    oracle=(
        "SELECT d.doc_id, "
        f"CAST(r.i // {_AUDIO_WIN} AS BIGINT) AS window_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_samples, "
        "CAST(SUM((d.doc_id + r.i) % 256) AS BIGINT) AS sum_amp, "
        "CAST(MAX((d.doc_id + r.i) % 256) AS BIGINT) AS max_amp "
        "FROM documents d JOIN range(0, 251) r(i) ON r.i < d.n_chars % 251 "
        "WHERE d.doc_id % 3 = 1 "
        f"GROUP BY d.doc_id, r.i // {_AUDIO_WIN}"
    ),
    doc="Windowed audio-sample statistics over REAL WAV payloads (VERDICT "
    "r3 item 2): the RIFF chunk walk decodes actual PCM u8 samples, then "
    "64-sample windows get count/sum/max via numpy inside mapInPandas. "
    "The oracle regenerates the deterministic sample bytes with a static "
    "range join (lateral generate_series is not DuckDB-expressible).",
)
def m05_audio_window_stats(spark, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return audio_window_stats(attach_real_payloads(docs), fake=False)


# --- m06: scene-change detection over REAL-decoded Y4M ---------------------

SCENE_LEN = 3  # frames per scene in the fixture
SCENE_MAD_THRESH = 0.5  # mean-abs-diff boundary threshold


def _scene_y4m_payload(doc_id: int):
    """Real Y4M whose frames are constant-luma per scene: scene s of doc d
    fills every plane byte with (d*31 + s*57) % 256. The decoded
    mean-abs-diff between consecutive frames is therefore 0 within a
    scene and |c_s - c_{s-1}| at boundaries — closed-form for the SQL
    oracle, while the Spark side derives it ONLY from decoded bytes."""
    from tectonic_spark.operators import codecs

    w = 8 + (doc_id % 3) * 4
    h = 8 + (doc_id % 2) * 4
    fb = codecs.frame_bytes_420(w, h)
    n_frames = 4 + doc_id % 9
    frames = [
        bytes([(doc_id * 31 + (f // SCENE_LEN) * 57) % 256]) * fb
        for f in range(n_frames)
    ]
    return codecs.encode_y4m(w, h, frames)


@register(
    "m06_scene_detection",
    oracle=f"""
    WITH v AS (SELECT doc_id, 4 + doc_id % 9 AS n_frames FROM documents),
    f AS (SELECT doc_id, unnest(range(1, n_frames)) AS frame_idx FROM v),
    d AS (SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                 CAST(abs((doc_id * 31 + (frame_idx // {SCENE_LEN}) * 57) % 256
                        - (doc_id * 31 + ((frame_idx - 1) // {SCENE_LEN}) * 57) % 256)
                      AS DOUBLE) AS mad
          FROM f)
    SELECT doc_id, frame_idx, mad,
           (mad > {SCENE_MAD_THRESH}) AS is_scene_start
    FROM d
    """,
    doc=f"Scene-change detection over REAL Y4M decode: every document "
    "carries an actual YUV4MPEG2 payload (constant-luma scenes of "
    f"{SCENE_LEN} frames); the operator decodes full 4:2:0 planes with "
    "the vendored codec and computes the mean absolute byte difference "
    "between consecutive frames in numpy, flagging boundaries where "
    f"mad > {SCENE_MAD_THRESH} — the keyframe-selection pass of a video "
    "training-data pipeline. The oracle predicts the SAME numbers in "
    "closed form from the fixture construction, so a wrong decode "
    "(plane size, frame offset, header parse) mismatches. 100 TB shape: "
    "payload bytes stay in executors (Arrow-batched mapInPandas), "
    "output is frames-per-doc rows, no shuffle before the caller's "
    "aggregation.",
)
def m06_scene_detection(spark, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.types import BooleanType, DoubleType

    from tectonic_spark.operators import codecs

    docs = spread_small_scan(
        table(spark, sf_dir, "documents").select("doc_id"), spark, "doc_id"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("frame_idx", LongType(), True),
            StructField("mad", DoubleType(), True),
            StructField("is_scene_start", BooleanType(), True),
        ]
    )

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                payload = _scene_y4m_payload(int(doc_id))
                _, _, frames = codecs.decode_y4m(payload)
                arrs = [np.frombuffer(fr, dtype=np.uint8) for fr in frames]
                for i in range(1, len(arrs)):
                    mad = float(
                        np.abs(
                            arrs[i].astype(np.int16)
                            - arrs[i - 1].astype(np.int16)
                        ).mean()
                    )
                    rows.append(
                        (int(doc_id), i, mad, mad > SCENE_MAD_THRESH)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "mad", "is_scene_start"]
            )

    return docs.mapInPandas(detect, schema)


# --- m07: audio resampling (integer decimation) over REAL WAV decode ------

RESAMPLE_FACTOR = 4


@register(
    "m07_audio_resample",
    oracle=f"""
    SELECT d.doc_id,
           CAST(d.n_chars % 251 AS BIGINT) AS n_in,
           CAST((d.n_chars % 251 + {RESAMPLE_FACTOR - 1}) // {RESAMPLE_FACTOR}
                AS BIGINT) AS n_out,
           CAST(44 + (d.n_chars % 251 + {RESAMPLE_FACTOR - 1})
                // {RESAMPLE_FACTOR} AS BIGINT) AS out_bytes,
           CAST(COALESCE(SUM(CASE WHEN r.i % {RESAMPLE_FACTOR} = 0
                             THEN (d.doc_id + r.i) % 256 END), 0) AS BIGINT)
             AS sum_out
    FROM documents d LEFT JOIN range(0, 251) r(i) ON r.i < d.n_chars % 251
    WHERE d.doc_id % 3 = 1
    GROUP BY d.doc_id, d.n_chars
    """,
    doc=f"Audio resampling over REAL WAV payloads: decode actual RIFF/PCM "
    f"u8 bytes, decimate 1-in-{RESAMPLE_FACTOR} in numpy (8 kHz → 2 kHz), "
    "and RE-ENCODE a valid WAV with the vendored codec — the sample-rate "
    "normalization step of an audio training-data pipeline, with both "
    "codec directions exercised per row. Output counts, re-encoded byte "
    "size (44-byte header + samples), and the decimated amplitude sum; "
    "the oracle predicts all four in closed form from the deterministic "
    "fixture, so a wrong chunk walk, off-by-one decimation phase, or "
    "header size mismatches. Arrow-batched mapInPandas; payloads never "
    "leave executors.",
)
def m07_audio_resample(spark, sf_dir: str) -> DataFrame:
    import numpy as np

    from tectonic_spark.operators import codecs

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    with_media = attach_real_payloads(docs).where(
        F.col("media_kind") == "audio"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_in", LongType(), True),
            StructField("n_out", LongType(), True),
            StructField("out_bytes", LongType(), True),
            StructField("sum_out", LongType(), True),
        ]
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                rate, samples = codecs.decode_wav(bytes(payload))
                arr = np.frombuffer(samples, dtype=np.uint8)
                dec = arr[::RESAMPLE_FACTOR]
                out = codecs.encode_wav(
                    dec.tobytes(), sample_rate=rate // RESAMPLE_FACTOR
                )
                rows.append(
                    (
                        int(doc_id),
                        len(arr),
                        len(dec),
                        len(out),
                        int(dec.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_in", "n_out", "out_bytes", "sum_out"],
            )

    return with_media.mapInPandas(resample, schema)


# --- m08: REAL JPEG decode (r5 — the last compressed-codec stub retired) --


def _jpeg_fixture_params(doc_id: int) -> tuple[int, int, str, int]:
    """(width, height, mode, restart_interval) of the m08 fixture image —
    every quantity a pure function of doc_id so the oracle stays ANSI-SQL.
    Dims are multiples of 8; mode cycles gray / 4:4:4 / 4:2:0 color;
    every 7th image is coded with restart markers (RST path coverage)."""
    w = 16 + (doc_id % 4) * 8
    h = 16 + ((doc_id // 4) % 3) * 8
    # m08 feeds doc_id % 3 == 0 rows, so the mode cycle must NOT key on
    # doc_id % 3 (it would be constant); // 3 makes consecutive images
    # cycle gray -> 4:4:4 -> 4:2:0
    mode = ("gray", "444", "420")[(doc_id // 3) % 3]
    ri = 2 if doc_id % 7 == 0 else 0
    return w, h, mode, ri


def _jpeg_block_value(doc_id: int, bi: int) -> int:
    """Luma value of 8x8 block ``bi`` (row-major): EVEN 0..254, so the
    DC-only quantization (q00=16 | 8*(v-128)) round-trips EXACTLY and the
    decoded pixel sum is closed-form."""
    return 2 * ((doc_id * 7 + bi * 13) % 128)


def _jpeg_payload(doc_id: int) -> bytes:
    """Deterministic baseline-JPEG bytes: per-8x8-block constant gray
    levels (R=G=B=v so Y=v, Cb=Cr=128 — flat chroma survives 4:2:0's 2x2
    average exactly)."""
    import numpy as np

    from tectonic_spark.operators.jpeg import encode_jpeg

    w, h, mode, ri = _jpeg_fixture_params(doc_id)
    bw = w // 8
    vals = np.array(
        [_jpeg_block_value(doc_id, bi) for bi in range((h // 8) * bw)],
        dtype=np.uint8,
    ).reshape(h // 8, bw)
    plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    if mode == "gray":
        return encode_jpeg(plane, restart_interval=ri)
    rgb = np.repeat(plane[:, :, None], 3, axis=2)
    return encode_jpeg(rgb, subsampling=mode, restart_interval=ri)


def m08_decode_kernel(docs: DataFrame) -> DataFrame:
    """The attach-real-JPEG-bytes + full-decode + pixel-sum stage over a
    (doc_id) frame — shared verbatim by batch m08 and streaming s12 (the
    stage is stateless per payload, so it drops into a streaming plan
    unchanged)."""
    import numpy as np

    from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch

    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
        ]
    )

    def attach_and_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # whole-Arrow-batch decode: dense restart-segmented payloads
            # ride ONE lockstep pass (r7 — the per-symbol Python walk was
            # the 100 TB decode bottleneck); thumbnails fall through to
            # the scalar path inside the same call, bit-identically
            ids = [int(d) for d in pdf["doc_id"]]
            pxs = decode_jpeg_batch([_jpeg_payload(d) for d in ids])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": [px.shape[1] for px in pxs],
                    "height": [px.shape[0] for px in pxs],
                    "px_sum": [int(px.astype(np.int64).sum()) for px in pxs],
                }
            )

    return docs.select("doc_id").mapInPandas(attach_and_decode, schema)


@register(
    "m08_jpeg_decode",
    oracle="""
    WITH img AS (
      SELECT doc_id,
             16 + (doc_id % 4) * 8 AS width,
             16 + ((doc_id // 4) % 3) * 8 AS height,
             (doc_id // 3) % 3 AS mode
      FROM documents WHERE doc_id % 3 = 0
    ),
    s AS (
      SELECT doc_id, width, height, mode,
             list_sum(list_transform(
               range(0, (width // 8) * (height // 8)),
               bi -> 2 * ((doc_id * 7 + bi * 13) % 128))) AS block_sum
      FROM img
    )
    SELECT doc_id, width, height,
           CAST(CASE WHEN mode = 0 THEN 64 * block_sum
                     ELSE 192 * block_sum END AS BIGINT) AS px_sum
    FROM s
    """,
    doc="REAL JPEG decode (VERDICT r4 item 1 — the last NotImplementedError "
    "codec stub, retired): every image-kind document carries actual "
    "baseline JFIF bytes built by the vendored encoder (grayscale, 4:4:4 "
    "and 4:2:0 color cycling by doc_id; every 7th stream coded with "
    "restart markers), and the vendored pure-Python+numpy decoder "
    "(huffman entropy decode, dequant, exact-float IDCT, chroma "
    "upsample, YCbCr->RGB) runs inside Arrow-batched mapInPandas. The "
    "fixture images are constant per 8x8 block at EVEN gray levels, so "
    "quantization is exactly invertible (q00=16 divides 8*(v-128)) and "
    "the oracle checks the decoded pixel SUM in closed form — a value "
    "that is wrong unless markers, huffman tables, coefficient EXTEND, "
    "dequant, IDCT, upsampling and color conversion are ALL right. "
    "General lossy streams are pinned against an independent closed-form "
    "DCT reference in tests/test_jpeg.py. 100 TB shape: decode is "
    "embarrassingly parallel per payload; only (doc_id, media) enters "
    "Python, Arrow-batched; compressed bytes never shuffle.",
)
def m08_jpeg_decode(spark, sf_dir: str) -> DataFrame:
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 0)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    return m08_decode_kernel(docs)


def _jpeg16_params(doc_id: int) -> tuple[int, int]:
    """(width, height) of the m09 fixture — multiples of 16 so the image
    is constant per 16x16 SUPERBLOCK and a nearest half-resize yields a
    per-8x8-constant image that re-encodes exactly."""
    return 32 + (doc_id % 3) * 16, 32 + ((doc_id // 3) % 2) * 16


def _jpeg16_block_value(doc_id: int, bi: int) -> int:
    return 2 * ((doc_id * 11 + bi * 17) % 128)


@register(
    "m09_jpeg_resize_reencode",
    oracle="""
    WITH img AS (
      SELECT doc_id,
             32 + (doc_id % 3) * 16 AS in_w,
             32 + ((doc_id // 3) % 2) * 16 AS in_h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id, in_w // 2 AS out_w, in_h // 2 AS out_h,
           -- each 16x16 input superblock becomes ONE 8x8 output block:
           -- 64 pixels x 3 channels = 192 per superblock value
           CAST(192 * list_sum(list_transform(
             range(0, (in_w // 16) * (in_h // 16)),
             bi -> 2 * ((doc_id * 11 + bi * 17) % 128))) AS BIGINT) AS px_sum
    FROM img
    """,
    doc="Compressed-media TRANSFORM pipeline: decode REAL baseline-JPEG "
    "bytes -> nearest-neighbor half-resize -> RE-ENCODE as JPEG -> "
    "decode the re-encoded stream, all inside one Arrow-batched "
    "mapInPandas stage (the thumbnail/preprocess pass of an image "
    "corpus). Fixture images are constant per 16x16 superblock at even "
    "gray levels, so the half-resized image is constant per 8x8 block "
    "and BOTH lossy hops are exactly invertible — the decoded output "
    "pixel sum has a closed-form oracle that breaks if either decode, "
    "the resize geometry, or the re-encode drifts. 100 TB shape: "
    "payload-parallel, nothing but (doc_id, stats) leaves the worker.",
)
def m09_jpeg_resize_reencode(spark, sf_dir: str) -> DataFrame:
    import numpy as np

    from tectonic_spark.operators.jpeg import encode_jpeg

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 0)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")

    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("out_w", LongType(), True),
            StructField("out_h", LongType(), True),
            StructField("px_sum", LongType(), True),
        ]
    )

    def pipeline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = _jpeg16_params(doc_id)
                bw = w // 16
                vals = np.array(
                    [
                        _jpeg16_block_value(doc_id, bi)
                        for bi in range((h // 16) * bw)
                    ],
                    dtype=np.uint8,
                ).reshape(h // 16, bw)
                plane = np.kron(vals, np.ones((16, 16), dtype=np.uint8))
                rgb = np.repeat(plane[:, :, None], 3, axis=2)
                ids.append(doc_id)
                payloads.append(encode_jpeg(rgb, subsampling="444"))
            # decode -> nearest half-resize -> re-encode -> decode, each
            # hop batched across the whole Arrow batch (r7 lockstep)
            smalls = [px[::2, ::2, :] for px in decode_jpeg_batch(payloads)]
            outs = decode_jpeg_batch(
                [encode_jpeg(s, subsampling="444") for s in smalls]
            )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "out_w": [o.shape[1] for o in outs],
                    "out_h": [o.shape[0] for o in outs],
                    "px_sum": [int(o.astype(np.int64).sum()) for o in outs],
                }
            )

    return docs.mapInPandas(pipeline, schema)


# --- m10: MP3 frame walk (compressed-audio metadata/integrity census) -----


@register(
    "m10_mp3_decode",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             2 + doc_id % 6 AS n_frames,
             [128, 160, 192, 224, 256][CAST(doc_id % 5 AS INT) + 1] AS kbps
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(44100 AS BIGINT) AS samplerate,
           CAST(kbps AS BIGINT) AS bitrate_kbps,
           CAST(n_frames * 1152 AS BIGINT) AS total_samples,
           CAST(n_frames * 1152 * 1000 // 44100 AS BIGINT) AS duration_ms,
           CAST(n_frames * (144000 * kbps // 44100)
                + list_sum(list_transform(range(0, n_frames),
                                          f -> (doc_id + f) % 2))
                AS BIGINT) AS payload_bytes
    FROM m
    """,
    doc="MP3 frame-level decode (VERDICT r5 item 5): every third document "
    "carries a REAL CBR MPEG-1 Layer III stream (valid sync headers, "
    "alternating padding, side-info blocks) built by the vendored frame "
    "encoder; codecs.parse_mp3 walks every frame — sync validation, "
    "bitrate/samplerate table decode, frame sizing, bit-reservoir "
    "back-pointer, ID3 skip — and reports the census a corpus audio "
    "pipeline needs (frame count, rate, duration, exact byte extent). "
    "The walker is validated against a REAL-WORLD MPEG-2 file in "
    "tests/test_flac_mp3.py. PCM synthesis is deliberately out of scope: "
    "it requires the ISO 11172-3 Annex-B constant tables (34 huffman "
    "tables + 512-tap synthesis window) which cannot be vendored from "
    "memory without mistranscription risk — FLAC (m12) is the natively "
    "PCM-decoded compressed audio format. Arrow-batched mapInPandas; "
    "payload bytes never leave executors.",
)
def m10_mp3_decode(spark, sf_dir: str) -> DataFrame:
    from tectonic_spark.operators import codecs

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 2)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("samplerate", LongType(), True),
            StructField("bitrate_kbps", LongType(), True),
            StructField("total_samples", LongType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("payload_bytes", LongType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = codecs.encode_mp3_frames(
                    2 + d % 6,
                    9 + d % 5,
                    pad_fn=lambda f, d=d: (d + f) % 2,
                    fill=d % 199,
                )
                info = codecs.parse_mp3(payload)
                rows.append(
                    (
                        d,
                        info["n_frames"],
                        info["samplerate"],
                        info["bitrate_kbps"],
                        info["total_samples"],
                        info["duration_ms"],
                        info["bytes_walked"],
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_frames",
                "samplerate",
                "bitrate_kbps",
                "total_samples",
                "duration_ms",
                "payload_bytes",
            ],
        )

    return docs.mapInPandas(walk, schema)


# --- m12: FLAC decode (REAL compressed-audio PCM decode, lossless) --------


def _flac_pcm(doc_id: int):
    """Deterministic 16-bit PCM for the FLAC fixtures (closed-form)."""
    import numpy as np

    n = 64 + doc_id % 190
    i = np.arange(n, dtype=np.int64)
    ch1 = (doc_id * 31 + i * 17) % 4001 - 2000
    if doc_id % 2 == 0:
        return ch1.astype(np.int16)
    ch2 = (doc_id * 13 + i * 29) % 4001 - 2000
    return np.stack([ch1, ch2], axis=1).astype(np.int16)


@register(
    "m12_flac_decode",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             64 + doc_id % 190 AS n,
             1 + doc_id % 2 AS ch
      FROM documents WHERE doc_id % 4 = 2
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(ch AS BIGINT) AS channels,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(list_sum(list_transform(range(0, n),
                    i -> (doc_id * 31 + i * 17) % 4001 - 2000))
                + CASE WHEN ch = 2
                       THEN list_sum(list_transform(range(0, n),
                                i -> (doc_id * 13 + i * 29) % 4001 - 2000))
                       ELSE 0 END AS BIGINT) AS pcm_sum,
           ((doc_id // 4) % 4 <> 0) AS first_subframe_lpc
    FROM f
    """,
    doc="REAL compressed-audio decode: every fourth document carries an "
    "actual FLAC stream (STREAMINFO + constant/fixed-predictor/LPC "
    "subframes + Rice-coded residuals, mono and stereo alternating) "
    "built by the vendored encoder, and the vendored pure-Python+numpy "
    "decoder (tectonic_spark.operators.flac) reconstructs PCM exactly — "
    "FLAC is lossless, so the oracle's closed-form sample sum must "
    "match bit-for-bit, and the decoder additionally verifies per-frame "
    "CRC-8/CRC-16 and the whole-stream STREAMINFO MD5 (an independent "
    "integrity oracle baked into the format). Three of every four "
    "payloads are LPC-encoded (orders 2/8/12, r8 — the encoder's "
    "deterministic-coefficient LPC mode) so the LPC inversion path — "
    "scalar loop AND the cross-lane lockstep filter — has driver-oracle "
    "coverage, pinned by first_subframe_lpc (an independent parse of "
    "the payload's first subframe type: a silent encoder fallback to "
    "FIXED flips the value hash). Stereo decorrelation, RICE2 and "
    "escaped partitions are pinned by hand-built streams in "
    "tests/test_flac_mp3.py. Arrow-batched mapInPandas; payload bytes "
    "never leave executors.",
)
def m12_flac_decode(spark, sf_dir: str) -> DataFrame:
    import numpy as np  # noqa: F401 — kernels below use it via closures

    from tectonic_spark.operators.flac import encode_flac

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 4 == 2)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    from pyspark.sql.types import BooleanType

    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_samples", LongType(), True),
            StructField("channels", LongType(), True),
            StructField("sample_rate", LongType(), True),
            StructField("pcm_sum", LongType(), True),
            StructField("first_subframe_lpc", BooleanType(), True),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.flac import (
            decode_flac_batch,
            first_subframe_is_lpc,
        )

        for pdf in batches:
            # whole-Arrow-batch decode (r7): real-world-blocksize corpora
            # ride the lockstep lane engine; these 64-sample-block fixtures
            # route to the scalar path inside the same call, bit-identically
            ids = [int(d) for d in pdf["doc_id"]]
            payloads = [
                encode_flac(
                    _flac_pcm(d),
                    sample_rate=8000,
                    block_size=64,
                    lpc_order=(0, 2, 8, 12)[(d // 4) % 4],
                )
                for d in ids
            ]
            decoded = decode_flac_batch(payloads)  # CRC + MD5 verified inside
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples": [pcm.shape[0] for _, pcm in decoded],
                    "channels": [pcm.shape[1] for _, pcm in decoded],
                    "sample_rate": [rate for rate, _ in decoded],
                    "pcm_sum": [int(pcm.sum()) for _, pcm in decoded],
                    "first_subframe_lpc": [
                        first_subframe_is_lpc(p) for p in payloads
                    ],
                }
            )

    return docs.mapInPandas(roundtrip, schema)


# --- m13: H.264 Annex-B frame census (compressed-video structural decode) --


@register(
    "m13_h264_census",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             2 + doc_id % 6 AS n_frames,
             2 + doc_id % 4 AS w_mbs,
             2 + doc_id % 3 AS h_mbs,
             doc_id % 2 AS cr,
             (doc_id // 2) % 2 AS cb
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_frames
                + CASE WHEN doc_id % 4 = 0 THEN (n_frames + 1) // 2 ELSE 0 END
                AS BIGINT) AS n_slices,
           CAST(1 AS BIGINT) AS n_idr,
           CAST(w_mbs * 16 - 2 * cr AS BIGINT) AS width,
           CAST(h_mbs * 16 - 2 * cb AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 66 ELSE 77 END AS BIGINT)
             AS profile_idc,
           CAST(30 + doc_id % 3 AS BIGINT) AS level_idc,
           TRUE AS extent_ok
    FROM m
    """,
    doc="H.264/AVC Annex-B frame census (VERDICT r6 item 5 — the m10 MP3 "
    "playbook applied to video): every third document carries a "
    "structurally valid Annex-B stream (real SPS/PPS/slice-header bit "
    "syntax with Exp-Golomb fields, emulation-prevention-escaped "
    "payloads, mixed 3/4-byte start codes, multi-slice frames); "
    "h264.parse_h264 walks every NAL — start-code sync, EBSP unescape, "
    "SPS profile/level/resolution incl. frame cropping, PPS census, "
    "slice-header parse with first_mb_in_slice==0 frame-boundary "
    "detection, IDR keyframe count, exact byte extents (extent_ok pins "
    "bytes_walked == payload length). Full pixel decode (CAVLC/CABAC + "
    "inter prediction) is documented out — pyav territory; the "
    "structural census is what corpus manifesting/sharding needs. "
    "Arrow-batched mapInPandas; payloads never leave executors.",
)
def m13_h264_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.h264 import encode_h264_annexb, parse_h264

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 1)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("n_slices", LongType(), True),
            StructField("n_idr", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("profile_idc", LongType(), True),
            StructField("level_idc", LongType(), True),
            StructField("extent_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = encode_h264_annexb(
                    2 + d % 6,
                    2 + d % 4,
                    2 + d % 3,
                    profile_idc=66 if d % 2 == 0 else 77,
                    level_idc=30 + d % 3,
                    crop_right=d % 2,
                    crop_bottom=(d // 2) % 2,
                    extra_slice_every=2 if d % 4 == 0 else 0,
                    fill_fn=lambda i, d=d: bytes(
                        (d * 31 + i * 37 + j) % 256 for j in range(3 + (d + i) % 7)
                    ),
                )
                info = parse_h264(payload)
                rows.append(
                    (
                        d,
                        info["n_frames"],
                        info["n_slices"],
                        info["n_idr"],
                        info["width"],
                        info["height"],
                        info["profile_idc"],
                        info["level_idc"],
                        info["bytes_walked"] == len(payload),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_frames",
                "n_slices",
                "n_idr",
                "width",
                "height",
                "profile_idc",
                "level_idc",
                "extent_ok",
            ],
        )

    return docs.mapInPandas(walk, schema)


# --- m14: dense JPEG decode THROUGH the lockstep lane engine ---------------


@register(
    "m14_jpeg_dense_decode",
    oracle="""
    SELECT doc_id,
           CAST(512 AS BIGINT) AS width,
           CAST(512 AS BIGINT) AS height,
           CAST(64 * list_sum(list_transform(range(0, 4096),
                bi -> 2 * ((doc_id * 7 + bi * 13) % 128))) AS BIGINT)
             AS px_sum,
           TRUE AS rode_engine
    FROM documents WHERE doc_id % 29 = 3
    """,
    doc="Dense-image decode pinned to the LOCKSTEP LANE ENGINE "
    "(r7, jpeg_lockstep.py): 512x512 grayscale baseline JPEGs with "
    "restart_interval=16 — 256 independent entropy segments per image, "
    "so every payload rides the vectorized engine inside the real "
    "mapInPandas path (m08's thumbnails route scalar by gate). Per-8x8-"
    "block constant EVEN gray levels keep the DC-only quantization "
    "exactly invertible, so the decoded pixel sum has a closed-form "
    "oracle; rode_engine is computed from the engine's own gate "
    "predicate per payload, so a future gate/threshold change that "
    "silently reroutes this corpus to the scalar path flips the value "
    "hash. 100 TB shape: the engine decodes whole Arrow batches, "
    "payloads never leave executors, scratch bounded by the 64 MB "
    "entropy pool cap.",
)
def m14_jpeg_dense_decode(spark, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.jpeg import encode_jpeg

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 29 == 3)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
            StructField("rode_engine", BooleanType(), True),
        ]
    )

    def dense_payload(d: int) -> bytes:
        bi = np.arange(4096, dtype=np.int64)
        vals = (2 * ((d * 7 + bi * 13) % 128)).astype(np.uint8).reshape(64, 64)
        plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        return encode_jpeg(plane, restart_interval=16)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.jpeg_lockstep import (
            decode_jpeg_batch,
            payload_rides_engine,
        )

        # bounded sub-batches: decode + reduce CHUNK images at a time
        # so buffers recycle through the heap free list and the 32-way
        # working set stays cache-sized (the r10 m17 pattern); each
        # chunk still carries hundreds of restart-segment lanes, far
        # above the lockstep engine gate, and engine routing is
        # per-payload deterministic (payload_rides_engine)
        CHUNK = 32
        for pdf in batches:
            all_ids = [int(d) for d in pdf["doc_id"]]
            rows: list[tuple] = []
            for off in range(0, len(all_ids), CHUNK):
                ids = all_ids[off : off + CHUNK]
                payloads = [dense_payload(d) for d in ids]
                pxs = decode_jpeg_batch(payloads)
                rows.extend(
                    (
                        d,
                        px.shape[1],
                        px.shape[0],
                        int(np.sum(px, dtype=np.int64)),
                        payload_rides_engine(p),
                    )
                    for d, px, p in zip(ids, pxs, payloads)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "px_sum", "rode_engine"],
            )

    return docs.mapInPandas(walk, schema)


# --- m15: dense PROGRESSIVE decode THROUGH the progressive lane engine -----


@register(
    "m15_jpeg_progressive_dense",
    oracle="""
    SELECT doc_id,
           CAST(512 AS BIGINT) AS width,
           CAST(512 AS BIGINT) AS height,
           CAST(64 * list_sum(list_transform(range(0, 4096),
                bi -> 2 * ((doc_id * 11 + bi * 17) % 128))) AS BIGINT)
             AS px_sum,
           TRUE AS rode_engine
    FROM documents WHERE doc_id % 31 = 7
    """,
    doc="Dense progressive decode pinned to the PROGRESSIVE LANE ENGINE "
    "(r8, jpeg_prog_lockstep.py — VERDICT r7's top ask): 512x512 "
    "grayscale SOF2 JPEGs with successive approximation (Al=1 first "
    "scans + DC/AC refinement rounds) and restart_interval=16, so every "
    "scan carries 256 independent entropy segments and the payload "
    "contributes 1024 lanes — above MIN_PROG_LANES on its own, making "
    "engine routing deterministic per payload. All four progressive "
    "machines (DC/AC x first/refine) run inside the real mapInPandas "
    "path. Per-8x8-block constant EVEN gray levels keep the DC-only "
    "quantization exactly invertible (q00=16 divides 8*(v-128), and "
    "successive approximation is lossless at Al=0), so the decoded "
    "pixel sum has a closed-form oracle; rode_engine is computed from "
    "the engine's own gate predicate per payload, so a gate/threshold "
    "change that silently reroutes this corpus to the scalar path flips "
    "the value hash. 100 TB shape: whole-Arrow-batch pools, payloads "
    "never leave executors, scratch bounded by COEF_BYTE_CAP + entropy "
    "pool caps (sequential sub-pools beyond).",
)
def m15_jpeg_progressive_dense(spark, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.jpeg import encode_jpeg_progressive

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 31 == 7)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
            StructField("rode_engine", BooleanType(), True),
        ]
    )

    def dense_payload(d: int) -> bytes:
        bi = np.arange(4096, dtype=np.int64)
        vals = (2 * ((d * 11 + bi * 17) % 128)).astype(np.uint8).reshape(64, 64)
        plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        return encode_jpeg_progressive(
            plane, bands=((1, 63),), successive=1, restart_interval=16
        )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch
        from tectonic_spark.operators.jpeg_prog_lockstep import (
            payload_rides_prog_engine,
        )

        # bounded sub-batches (the r10 m17 pattern — see m14)
        CHUNK = 32
        for pdf in batches:
            all_ids = [int(d) for d in pdf["doc_id"]]
            rows: list[tuple] = []
            for off in range(0, len(all_ids), CHUNK):
                ids = all_ids[off : off + CHUNK]
                payloads = [dense_payload(d) for d in ids]
                pxs = decode_jpeg_batch(payloads)
                rows.extend(
                    (
                        d,
                        px.shape[1],
                        px.shape[0],
                        int(np.sum(px, dtype=np.int64)),
                        payload_rides_prog_engine(p),
                    )
                    for d, px, p in zip(ids, pxs, payloads)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "px_sum", "rode_engine"],
            )

    return docs.mapInPandas(walk, schema)


# --- m17: PNG decode through the wavefront unfilter engine -----------------


@register(
    "m17_png_decode",
    oracle="""
    SELECT doc_id,
           CAST(512 AS BIGINT) AS width,
           CAST(512 AS BIGINT) AS height,
           CAST(64 * list_sum(list_transform(range(0, 4096),
                bi -> (doc_id * 13 + bi * 19) % 256)) AS BIGINT)
             AS px_sum,
           CAST(102 AS BIGINT) AS paeth_rows,
           TRUE AS wavefront,
           TRUE AS rode_pool
    FROM documents WHERE doc_id % 41 = 9
    """,
    doc="PNG decode (r9, png.py — VERDICT r8 item 3: the last big-ticket "
    "image format of real crawls): 512x512 grayscale PNGs whose 512 rows "
    "CYCLE through all five PNG filters (None/Sub/Up/Average/Paeth), "
    "decoded by the vendored pure-numpy codec — chunk walk with CRC "
    "validation, stdlib-zlib inflate, and the anti-diagonal WAVEFRONT "
    "unfilter (Average/Paeth read the reconstructed left pixel, so the "
    "recurrence vectorizes along anti-diagonals instead of scalar "
    "per-byte), batched through the cross-image SEGMENT-LANE pool "
    "(decode_png_batch: independent-row segments from many images "
    "reconstruct in diagonal lockstep; each fixture payload carries "
    "~102 segment lanes, above the pool gate on its own). PNG is "
    "lossless, so the decoded pixel sum has the m08 closed-form oracle "
    "shape with no quantization caveats; paeth_rows comes from the "
    "DECODER's own filter histogram (pins that the payload bytes "
    "really carried the full filter cycle), wavefront pins the engine "
    "tier, and rode_pool pins pool routing via the gate predicate "
    "(payload_rides_png_pool — the m15 pattern; the pool has no silent "
    "fallback, so an engine bug fails the query loudly). 100 TB shape: "
    "payloads never leave executors, pool scratch arena-backed and "
    "capped per sub-pool, decode parallelizes with the scan's split "
    "fan-out.",
)
def m17_png_decode(spark, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 41 == 9)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
            StructField("paeth_rows", LongType(), True),
            StructField("wavefront", BooleanType(), True),
            StructField("rode_pool", BooleanType(), True),
        ]
    )

    def png_payload(d: int) -> bytes:
        from tectonic_spark.operators.png import encode_png

        bi = np.arange(4096, dtype=np.int64)
        vals = ((d * 13 + bi * 19) % 256).astype(np.uint8).reshape(64, 64)
        plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        return encode_png(plane, filters=None)  # cycle 0..4 per row

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.png import (
            decode_png_batch,
            payload_rides_png_pool,
        )

        # decode in bounded sub-batches and reduce immediately: an
        # Arrow batch can carry thousands of rows, and holding every
        # payload's raw/rows/pixel buffers at once (~800 KB/img) both
        # spikes peak memory and defeats the heap free-list recycling
        # ensure_flat_malloc() buys (the r10 m17 sf10 fix — buffers of
        # one sub-batch are reused verbatim by the next)
        CHUNK = 8
        for pdf in batches:
            all_ids = [int(d) for d in pdf["doc_id"]]
            rows: list[tuple] = []
            for off in range(0, len(all_ids), CHUNK):
                ids = all_ids[off : off + CHUNK]
                payloads = [png_payload(d) for d in ids]
                stats: list = []
                pxs = decode_png_batch(payloads, stats_out=stats)
                rows.extend(
                    (
                        d,
                        px.shape[1],
                        px.shape[0],
                        int(np.sum(px, dtype=np.int64)),
                        st["filter_rows"][4],
                        st["wavefront"],
                        payload_rides_png_pool(p),
                    )
                    for d, px, st, p in zip(ids, pxs, stats, payloads)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "px_sum",
                    "paeth_rows",
                    "wavefront",
                    "rode_pool",
                ],
            )

    return docs.mapInPandas(walk, schema)


def mixed_media_kernel(docs: DataFrame) -> DataFrame:
    """Heterogeneous-crawl decode stage (r9): each doc_id carries ONE of
    the three vendored image formats — baseline JPEG (the m08 fixture),
    filter-cycling PNG (a 128x128 m17 shape), or a 16-color GIF frame
    (the m18 shape) — chosen by ``(doc_id // 4) % 3``, and the batch
    routes each group through its format's BATCH engine
    (decode_jpeg_batch lane pools / decode_png_batch segment-lane pool /
    per-payload LZW). Stateless per payload, so the same stage runs in
    batch and streaming plans unchanged (the m08/s12 pattern); every
    decoded pixel sum is closed-form in doc_id."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("fmt", StringType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
        ]
    )

    def png_payload(d: int) -> bytes:
        from tectonic_spark.operators.png import encode_png

        bi = np.arange(256, dtype=np.int64)
        vals = ((d * 13 + bi * 19) % 256).astype(np.uint8).reshape(16, 16)
        plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        return encode_png(plane, filters=None)

    def gif_payload(d: int) -> bytes:
        from tectonic_spark.operators.gif import encode_gif

        pal = np.stack(
            [(d * 5 + np.arange(16) * 11 + c * 3) % 256 for c in range(3)],
            axis=1,
        ).astype(np.uint8)
        r = np.arange(24)[:, None]
        c = np.arange(18)[None, :]
        return encode_gif(((d + r * 3 + c) % 16).astype(np.uint8), pal)

    def attach_and_decode(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.gif import decode_gif
        from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch
        from tectonic_spark.operators.png import decode_png_batch

        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            rows: list = [None] * len(ids)
            groups: dict[int, list[int]] = {0: [], 1: [], 2: []}
            for i, d in enumerate(ids):
                groups[(d // 4) % 3].append(i)
            if groups[0]:
                pxs = decode_jpeg_batch(
                    [_jpeg_payload(ids[i]) for i in groups[0]]
                )
                for i, px in zip(groups[0], pxs):
                    rows[i] = (
                        ids[i],
                        "jpeg",
                        px.shape[1],
                        px.shape[0],
                        int(px.astype(np.int64).sum()),
                    )
            if groups[1]:
                pxs = decode_png_batch(
                    [png_payload(ids[i]) for i in groups[1]]
                )
                for i, px in zip(groups[1], pxs):
                    rows[i] = (
                        ids[i],
                        "png",
                        px.shape[1],
                        px.shape[0],
                        int(px.astype(np.int64).sum()),
                    )
            for i in groups[2]:
                got = decode_gif(gif_payload(ids[i]))
                fr = got["frames"][0]
                rows[i] = (
                    ids[i],
                    "gif",
                    got["width"],
                    got["height"],
                    int(fr["rgb"].astype(np.int64).sum()),
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "width", "height", "px_sum"]
            )

    return docs.select("doc_id").mapInPandas(attach_and_decode, schema)


# --- m18: GIF decode (LZW, palettes, interlace, animation census) ----------


@register(
    "m18_gif_decode",
    oracle="""
    SELECT doc_id,
           CAST(18 AS BIGINT) AS width,
           CAST(24 AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS n_frames,
           CAST(list_sum(list_transform(range(0, 1296), f ->
                 ((doc_id * 5 + ((doc_id + (f // 432) * 7
                    + ((f % 432) // 18) * 3 + (f % 18)) % 16) * 11) % 256)
               + ((doc_id * 5 + ((doc_id + (f // 432) * 7
                    + ((f % 432) // 18) * 3 + (f % 18)) % 16) * 11 + 3) % 256)
               + ((doc_id * 5 + ((doc_id + (f // 432) * 7
                    + ((f % 432) // 18) * 3 + (f % 18)) % 16) * 11 + 6) % 256)
           )) AS BIGINT) AS rgb_sum,
           CAST(1 AS BIGINT) AS interlaced_frames,
           CAST(2 AS BIGINT) AS loop_count,
           TRUE AS extent_ok
    FROM documents WHERE doc_id % 43 = 12
    """,
    doc="GIF decode (r9, gif.py — after JPEG and PNG the remaining image "
    "format real crawls hit at volume, and the dominant short-animation "
    "container): 3-frame 18x24 animations with a closed-form 16-color "
    "global palette, NETSCAPE loop extension, per-frame graphic-control "
    "extensions, and frame 1 interlaced, decoded by the vendored "
    "pure-Python codec — full variable-width LZW (width growth, "
    "dictionary reset, cScSc special case), 4-pass de-interlacing, "
    "sub-block framing, CRC-free census with byte-extent accounting. "
    "GIF is lossless over palette indices, so rgb_sum (palette-resolved "
    "sum across all frames) has a closed-form oracle; extent_ok pins "
    "that parse_gif walked every byte. The LZW width protocol is pinned "
    "against REAL third-party encoder output in tests (the CPython "
    "idlelib icon set decodes 9/9 with full extents). LZW is inherently "
    "serial per stream, so the 100 TB lever is per-payload parallelism "
    "inside Arrow-batched mapInPandas (payloads never shuffle), not "
    "intra-stream vectorization — contrast png.py's wavefront pool, "
    "whose recurrence does vectorize.",
)
def m18_gif_decode(spark, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 43 == 12)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("rgb_sum", LongType(), True),
            StructField("interlaced_frames", LongType(), True),
            StructField("loop_count", LongType(), True),
            StructField("extent_ok", BooleanType(), True),
        ]
    )

    def gif_payload(d: int) -> bytes:
        from tectonic_spark.operators.gif import encode_gif

        pal = np.stack(
            [
                (d * 5 + np.arange(16) * 11 + c * 3) % 256
                for c in range(3)
            ],
            axis=1,
        ).astype(np.uint8)
        r = np.arange(24)[:, None]
        c = np.arange(18)[None, :]
        frames = [
            ((d + k * 7 + r * 3 + c) % 16).astype(np.uint8) for k in range(3)
        ]
        return encode_gif(
            frames,
            pal,
            loop=2,
            delays=[4, 5, 6],
            interlace=[False, True, False],  # frame 1 interlaced
        )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.gif import decode_gif, parse_gif

        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = gif_payload(d)
                got = decode_gif(payload)
                meta = parse_gif(payload)
                rgb = sum(
                    int(fr["rgb"].astype(np.int64).sum())
                    for fr in got["frames"]
                )
                rows.append(
                    (
                        d,
                        got["width"],
                        got["height"],
                        len(got["frames"]),
                        rgb,
                        meta["n_interlaced"],
                        got["loop"],
                        meta["bytes_walked"] == len(payload),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "width",
                "height",
                "n_frames",
                "rgb_sum",
                "interlaced_frames",
                "loop_count",
                "extent_ok",
            ],
        )

    return docs.mapInPandas(walk, schema)


# --- m19: baseline TIFF decode (LZW/PackBits/predictor, strips) ------------


@register(
    "m19_tiff_decode",
    oracle="""
    SELECT doc_id,
           CAST(48 AS BIGINT) AS width,
           CAST(40 AS BIGINT) AS height,
           CAST(list_sum(list_transform(range(0, 1920),
                i -> (doc_id * 9 + i * 17) % 256)) AS BIGINT) AS px_sum,
           CAST(CASE (doc_id // 2) % 3 WHEN 0 THEN 1 WHEN 1 THEN 5
                ELSE 32773 END AS BIGINT) AS compression,
           CAST(3 AS BIGINT) AS n_strips,
           CAST(1 AS BIGINT) AS n_pages
    FROM documents WHERE doc_id % 47 = 17
    """,
    doc="Baseline TIFF decode (r9, tiff.py — the document/scan-corpus "
    "format, completing the crawl-image family): 48x40 grayscale TIFFs "
    "cycling compression none / LZW / PackBits by doc_id (LZW carries "
    "the horizontal-differencing predictor — the libtiff default "
    "pairing), split over 3 strips, decoded by the vendored pure-Python "
    "codec: IFD tag walk, TIFF-variant LZW (MSB-first, EARLY-CHANGE "
    "width bump — one code earlier than GIF's protocol), PackBits RLE, "
    "predictor-2 cumsum reconstruction. Lossless, so the per-pixel "
    "closed-form oracle pins the whole chain; compression/n_strips/"
    "n_pages come from the structural census (parse_tiff). Interop is "
    "pinned in tests against the RGBA TIFF shipped with CPython's test "
    "suite. 100 TB shape: per-payload mapInPandas parallelism; strips "
    "are the format's own intra-file parallelism unit.",
)
def m19_tiff_decode(spark, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 47 == 17)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
            StructField("compression", LongType(), True),
            StructField("n_strips", LongType(), True),
            StructField("n_pages", LongType(), True),
        ]
    )

    def tiff_payload(d: int) -> bytes:
        from tectonic_spark.operators.tiff import encode_tiff

        i = np.arange(40 * 48, dtype=np.int64)
        img = ((d * 9 + i * 17) % 256).astype(np.uint8).reshape(40, 48)
        comp = (1, 5, 32773)[(d // 2) % 3]
        return encode_tiff(
            img,
            compression=comp,
            predictor=2 if comp == 5 else 1,
            rows_per_strip=16,
        )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.tiff import decode_tiff, parse_tiff

        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = tiff_payload(d)
                px = decode_tiff(payload)
                meta = parse_tiff(payload)
                rows.append(
                    (
                        d,
                        px.shape[1],
                        px.shape[0],
                        int(px.astype(np.int64).sum()),
                        meta["compression"],
                        meta["n_strips"],
                        meta["n_pages"],
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "width",
                "height",
                "px_sum",
                "compression",
                "n_strips",
                "n_pages",
            ],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m20_webp_decode",
    oracle="""
    WITH d AS (SELECT doc_id, (doc_id // 2) % 4 AS v
               FROM documents WHERE doc_id % 43 = 21)
    SELECT doc_id,
           CAST(48 AS BIGINT) AS width,
           CAST(48 AS BIGINT) AS height,
           CAST(CASE WHEN v = 2
             THEN list_sum(list_transform(range(0, 2304), i ->
                    (doc_id * 5  + ((doc_id + i) % 13) * 17) % 256
                  + (doc_id * 11 + ((doc_id + i) % 13) * 7)  % 256
                  + (doc_id * 17 + ((doc_id + i) % 13) * 3)  % 256
                  + 255))
             ELSE list_sum(list_transform(range(0, 2304), i ->
                    (doc_id * 13 + i * 19) % 256
                  + (doc_id * 7  + i * 5)  % 256
                  + (doc_id * 3  + i * 11) % 256
                  + 255))
           END AS BIGINT) AS px_sum,
           CAST(v AS BIGINT) AS variant,
           CAST(CASE v WHEN 0 THEN 0 WHEN 2 THEN 1 ELSE 2 END AS BIGINT)
             AS n_transforms
    FROM d
    """,
    doc="WebP lossless (VP8L) decode (r10, webp.py — VERDICT r9 item 2: "
    "the highest-volume image format the engine could not yet decode; "
    "it outranks GIF in modern crawls): 48x48 RGBA images cycling four "
    "encoder shapes by doc_id — plain literals + LZ77 + a 6-bit color "
    "cache, subtract-green + the Select predictor (mode 11), a "
    "13-color color-indexing palette with 2-pixels-per-byte bundling, "
    "and subtract-green + the per-tile signed color transform — "
    "decoded by the vendored pure-Python codec: canonical prefix codes "
    "(incl. the 19-symbol code-length code), color cache, the 120-entry "
    "close-neighborhood distance mapping (generated from its defining "
    "rule, not vendored), meta prefix groups, and all four transform "
    "inverses. Lossless, so the closed-form RGBA pixel-sum oracle pins "
    "the whole chain; variant/n_transforms are pinned from the "
    "DECODER's transform census (stats), so a stream that silently "
    "skipped a transform fails loudly. Interop is pinned in tests "
    "against the real libwebp-encoded lossless ALPH stream in "
    "CPython's python.webp. 100 TB shape: per-payload mapInPandas "
    "parallelism (the m08 pattern); payloads never leave executors.",
)
def m20_webp_decode(spark, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 43 == 21)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
            StructField("variant", LongType(), True),
            StructField("n_transforms", LongType(), True),
        ]
    )

    def webp_payload(d: int) -> bytes:
        from tectonic_spark.operators.webp import encode_webp

        v = (d // 2) % 4
        i = np.arange(2304, dtype=np.int64)
        if v == 2:
            idx = (d + i) % 13
            r = (d * 5 + idx * 17) % 256
            g = (d * 11 + idx * 7) % 256
            b = (d * 17 + idx * 3) % 256
        else:
            r = (d * 13 + i * 19) % 256
            g = (d * 7 + i * 5) % 256
            b = (d * 3 + i * 11) % 256
        img = np.stack(
            [r, g, b, np.full(2304, 255, dtype=np.int64)], axis=1
        ).astype(np.uint8).reshape(48, 48, 4)
        if v == 0:
            return encode_webp(img, cache_bits=6)
        if v == 1:
            return encode_webp(
                img, subtract_green=True, predictor=11, predictor_bits=4
            )
        if v == 2:
            return encode_webp(img, palette=True)
        return encode_webp(
            img, subtract_green=True, color=(17, -9, 5), color_bits=4
        )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.webp import decode_webp

        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                stats: dict = {}
                px = decode_webp(webp_payload(d), stats=stats)
                rows.append(
                    (
                        d,
                        px.shape[1],
                        px.shape[0],
                        int(px.astype(np.int64).sum()),
                        (d // 2) % 4,
                        len(stats["transforms"]),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "width",
                "height",
                "px_sum",
                "variant",
                "n_transforms",
            ],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m21_exif_extract",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'webp' ELSE 'jpeg' END AS carrier,
           CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
           '2024:' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
             || ':' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
             || ' 10:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             || ':00' AS dt,
           'CAM' || CAST(doc_id % 5 AS VARCHAR) AS make,
           'MOD' || CAST(doc_id % 7 AS VARCHAR) AS model,
           CAST(100 * (1 + doc_id % 16) AS BIGINT) AS iso,
           CASE WHEN doc_id % 2 = 0 THEN 'N' ELSE 'S' END AS lat_ref,
           CAST((doc_id % 90) * 3600000 + (doc_id % 60) * 60000
                + ((doc_id * 7) % 6000) * 10 AS BIGINT) AS lat_mas,
           CASE WHEN doc_id % 3 = 0 THEN 'E' ELSE 'W' END AS lon_ref,
           CAST((doc_id % 180) * 3600000 + ((doc_id * 3) % 60) * 60000
                + ((doc_id * 11) % 6000) * 10 AS BIGINT) AS lon_mas
    FROM documents WHERE doc_id % 37 = 5
    """,
    doc="EXIF metadata extraction (r10, exif.py — VERDICT r9 item 3: "
    "crawl pipelines read orientation/timestamp/GPS before dedup and "
    "filtering): payloads alternate between a real JPEG carrying an "
    "APP1 EXIF segment (spliced after SOI, where cameras put it) and "
    "an extended-container WebP carrying a VP8X EXIF chunk; the "
    "extractor sniffs the container from payload magic (the reported "
    "carrier column comes from the SNIFF, not the fixture arithmetic, "
    "so mis-routing fails loudly), surfaces the raw EXIF bytes via the "
    "carrier-specific walk (JPEG marker-length walk / RIFF chunk "
    "walk), and parses them with the SAME TIFF IFD walker that decodes "
    "m19 pages — EXIF is a TIFF structure (IFD0 + Exif/GPS sub-IFDs, "
    "RATIONAL GPS coordinates). GPS DMS rationals reduce to exact "
    "integer milli-arcseconds so the oracle stays in integer space. "
    "100 TB shape: pure per-payload header parsing in the decode "
    "stage's mapInPandas; no shuffle, no state.",
)
def m21_exif_extract(spark, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 37 == 5)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("carrier", StringType(), True),
            StructField("orientation", LongType(), True),
            StructField("dt", StringType(), True),
            StructField("make", StringType(), True),
            StructField("model", StringType(), True),
            StructField("iso", LongType(), True),
            StructField("lat_ref", StringType(), True),
            StructField("lat_mas", LongType(), True),
            StructField("lon_ref", StringType(), True),
            StructField("lon_mas", LongType(), True),
        ]
    )

    def exif_fixture(d: int) -> bytes:
        from tectonic_spark.operators.exif import build_exif

        return build_exif(
            orientation=1 + d % 8,
            datetime=(
                f"2024:{1 + d % 12:02d}:{1 + d % 28:02d} 10:{d % 60:02d}:00"
            ),
            datetime_original=(
                f"2024:{1 + d % 12:02d}:{1 + d % 28:02d} 10:{d % 60:02d}:00"
            ),
            make=f"CAM{d % 5}",
            model=f"MOD{d % 7}",
            iso=100 * (1 + d % 16),
            gps_lat=(
                "N" if d % 2 == 0 else "S",
                (d % 90, 1),
                (d % 60, 1),
                ((d * 7) % 6000, 100),
            ),
            gps_lon=(
                "E" if d % 3 == 0 else "W",
                (d % 180, 1),
                ((d * 3) % 60, 1),
                ((d * 11) % 6000, 100),
            ),
            prefix=False,
        )

    def payload_of(d: int) -> bytes:
        ex = exif_fixture(d)
        if d % 2 == 0:
            from tectonic_spark.operators.webp import encode_webp

            i = np.arange(256, dtype=np.int64)
            img = np.stack(
                [(d * 13 + i * 19) % 256, (d * 7 + i * 5) % 256,
                 (d * 3 + i * 11) % 256, np.full(256, 255, np.int64)],
                axis=1,
            ).astype(np.uint8).reshape(16, 16, 4)
            return encode_webp(img, subtract_green=True, exif=ex)
        from tectonic_spark.operators.exif import insert_exif_jpeg
        from tectonic_spark.operators.jpeg import encode_jpeg

        i = np.arange(256, dtype=np.int64)
        img = ((d * 13 + i * 19) % 256).astype(np.uint8).reshape(16, 16)
        return insert_exif_jpeg(encode_jpeg(img), ex)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.exif import exif_from_jpeg, parse_exif
        from tectonic_spark.operators.webp import exif_payload

        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = payload_of(d)
                # carrier from the payload MAGIC, not fixture arithmetic
                if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
                    carrier = "webp"
                    raw = exif_payload(payload)
                elif payload[:2] == b"\xff\xd8":
                    carrier = "jpeg"
                    raw = exif_from_jpeg(payload)
                else:
                    raise ValueError("unroutable m21 payload")
                meta = parse_exif(raw)
                rows.append(
                    (
                        d,
                        carrier,
                        meta["orientation"],
                        meta["datetime"],
                        meta["make"],
                        meta["model"],
                        meta["iso"],
                        meta["gps_lat_ref"],
                        meta["gps_lat_mas"],
                        meta["gps_lon_ref"],
                        meta["gps_lon_mas"],
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "carrier",
                "orientation",
                "dt",
                "make",
                "model",
                "iso",
                "lat_ref",
                "lat_mas",
                "lon_ref",
                "lon_mas",
            ],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m22_ogg_census",
    oracle="""
    WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS nd,
                      CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS big
               FROM documents WHERE doc_id % 53 = 11)
    SELECT doc_id,
           CAST(2 + nd + 2 * big AS BIGINT) AS n_pages,
           CAST(2 + nd + big AS BIGINT) AS n_packets,
           'opus' AS codec,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(312 + doc_id % 100 AS BIGINT) AS pre_skip,
           CAST(960 * (nd + big) AS BIGINT) AS duration_samples,
           CAST(960 * (nd + big) AS BIGINT) AS toc_duration_samples,
           CAST(big AS BIGINT) AS spanned_packets,
           TRUE AS eos
    FROM d
    """,
    doc="Ogg/Opus container census (r10, ogg.py — VERDICT r9 item 7: the "
    "audio analog of the MP4 walk; Ogg/Opus is the dominant "
    "speech-corpus container): real Ogg pages — CRC-validated (the "
    "RFC 3533 0x04c11db7 CRC, table generated from the polynomial), "
    "OpusHead BOS + OpusTags header pages, one 20 ms Opus packet per "
    "page, and for every third doc a 600-byte packet that SPANS pages "
    "via 255-lacing + continued-flag + granule -1 continuation — "
    "walked by parse_ogg: packet reassembly across pages, per-stream "
    "codec identification, and TWO independent duration derivations "
    "(last-granule minus pre-skip vs per-packet TOC frame-size "
    "accounting per RFC 6716 §3.1) that the oracle pins EQUAL, so a "
    "page-walk or TOC bug cannot cancel out. Audio sample synthesis "
    "(SILK/CELT) is documented out — the same census boundary as "
    "MP3/H.264. 100 TB shape: per-payload mapInPandas parallelism "
    "(the m16 pattern).",
)
def m22_ogg_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 53 == 11)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_pages", LongType(), True),
            StructField("n_packets", LongType(), True),
            StructField("codec", StringType(), True),
            StructField("channels", LongType(), True),
            StructField("pre_skip", LongType(), True),
            StructField("duration_samples", LongType(), True),
            StructField("toc_duration_samples", LongType(), True),
            StructField("spanned_packets", LongType(), True),
            StructField("eos", BooleanType(), True),
        ]
    )

    def ogg_payload(d: int) -> bytes:
        from tectonic_spark.operators.ogg import encode_ogg_opus

        toc = (1 << 3) | ((d % 2) << 2)  # 20 ms NB SILK, stereo bit
        packets = []
        for k in range(1 + d % 7):
            size = 40 + (d * 13 + k * 37) % 180
            body = bytes((d * 7 + j) % 256 for j in range(size - 1))
            packets.append(bytes([toc]) + body)
        if d % 3 == 0:
            packets.append(bytes([toc]) + bytes((d + j) % 256 for j in range(599)))
        return encode_ogg_opus(
            packets,
            channels=1 + d % 2,
            pre_skip=312 + d % 100,
            max_segments_per_page=2,
        )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.ogg import parse_ogg

        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                info = parse_ogg(ogg_payload(d))
                if info["n_streams"] != 1:
                    raise ValueError("m22 fixture must be single-stream")
                s = info["streams"][0]
                rows.append(
                    (
                        d,
                        info["n_pages"],
                        s["n_packets"],
                        s["codec"],
                        s["channels"],
                        s["pre_skip"],
                        s["duration_samples"],
                        s["toc_duration_samples"],
                        s["spanned_packets"],
                        s["eos"],
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_pages",
                "n_packets",
                "codec",
                "channels",
                "pre_skip",
                "duration_samples",
                "toc_duration_samples",
                "spanned_packets",
                "eos",
            ],
        )

    return docs.mapInPandas(walk, schema)


# --- m11: progressive JPEG decode (SOF2 spectral selection) ---------------


@register(
    "m11_jpeg_progressive",
    oracle=_REG["m08_jpeg_decode"].oracle,
    doc="Progressive JPEG decode (VERDICT r5 item 9 — SOF2, the second "
    "codec gap real crawls hit after MP3): the SAME exactly-invertible "
    "fixture images as m08, re-encoded in progressive spectral-selection "
    "mode (interleaved DC scan + per-component AC band scans) by the "
    "vendored progressive encoder, then decoded by the progressive scan "
    "machinery (coefficient accumulation across scans, EOB-runs, "
    "non-interleaved grids). Quantized coefficients are identical to the "
    "baseline encoding, so the decoded pixel sums must match m08's "
    "closed-form oracle EXACTLY — wrong scan routing, band bookkeeping "
    "or grid sizing cannot cancel out. Successive-approximation "
    "(Ah/Al) decode paths are pinned by hand-built streams in "
    "tests/test_jpeg.py. Arrow-batched mapInPandas.",
)
def m11_jpeg_progressive(spark, sf_dir: str) -> DataFrame:
    import numpy as np

    from tectonic_spark.operators.jpeg import decode_jpeg, encode_jpeg_progressive

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 3 == 0)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("px_sum", LongType(), True),
        ]
    )

    def attach_and_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, mode, _ri = _jpeg_fixture_params(d)
                bw = w // 8
                vals = np.array(
                    [_jpeg_block_value(d, bi) for bi in range((h // 8) * bw)],
                    dtype=np.uint8,
                ).reshape(h // 8, bw)
                plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                if mode == "gray":
                    payload = encode_jpeg_progressive(plane)
                else:
                    rgb = np.repeat(plane[:, :, None], 3, axis=2)
                    payload = encode_jpeg_progressive(rgb, subsampling=mode)
                px = decode_jpeg(payload)
                rows.append(
                    (d, px.shape[1], px.shape[0], int(px.astype(np.int64).sum()))
                )
        yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "px_sum"])

    return docs.mapInPandas(attach_and_decode, schema)


# --- m16: MP4/AVCC container census (the dominant real-video container) ----


@register(
    "m16_mp4_census",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             2 + doc_id % 6 AS n_frames,
             2 + doc_id % 4 AS w_mbs,
             2 + doc_id % 3 AS h_mbs,
             doc_id % 2 AS cr,
             (doc_id // 2) % 2 AS cb
      FROM documents WHERE doc_id % 37 = 4
    )
    SELECT doc_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_frames
                + CASE WHEN doc_id % 4 = 0 THEN (n_frames + 1) // 2 ELSE 0 END
                AS BIGINT) AS n_slices,
           CAST(1 AS BIGINT) AS n_idr,
           CAST(w_mbs * 16 - 2 * cr AS BIGINT) AS width,
           CAST(h_mbs * 16 - 2 * cb AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 66 ELSE 77 END AS BIGINT)
             AS profile_idc,
           CAST(30 + doc_id % 3 AS BIGINT) AS level_idc,
           CAST(4 AS BIGINT) AS length_size,
           TRUE AS extent_ok
    FROM m
    """,
    doc="MP4/AVCC container census (VERDICT r7 item 4 — real video "
    "corpora ship MP4, not raw Annex-B, so m13's census was blind to "
    "the dominant container): every 37th document carries a "
    "structurally complete MP4 built by the vendored box writer "
    "(ftyp/mdat/moov with correct mvhd/tkhd/mdhd/hdlr/vmhd/dinf and "
    "stts/stsc/stsz/stco sample tables; SPS/PPS in the avcC "
    "AVCDecoderConfigurationRecord, 4-byte length-prefixed NAL samples "
    "in mdat). h264.parse_mp4 walks the box tree to avcC, parses the "
    "SPS (profile/level/resolution incl. cropping), then runs the "
    "Annex-B frame census over the length-prefixed mdat NALs. "
    "bytes_walked is accumulated from consumed pieces, so extent_ok "
    "pins the walk covering the whole file; length_size pins the avcC "
    "parse. Same slice/frame content as m13's fixtures — the two "
    "containers must agree. Arrow-batched mapInPandas.",
)
def m16_mp4_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.h264 import encode_mp4_avcc, parse_mp4

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 37 == 4)
    )
    # CPU-heavy per-payload kernel downstream of a tiny scan:
    # spread across cores when the input arrives in fewer splits
    # than parallelism (no-op at real scale — tables.py doctrine)
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("n_slices", LongType(), True),
            StructField("n_idr", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("profile_idc", LongType(), True),
            StructField("level_idc", LongType(), True),
            StructField("length_size", LongType(), True),
            StructField("extent_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = encode_mp4_avcc(
                    2 + d % 6,
                    2 + d % 4,
                    2 + d % 3,
                    profile_idc=66 if d % 2 == 0 else 77,
                    level_idc=30 + d % 3,
                    crop_right=d % 2,
                    crop_bottom=(d // 2) % 2,
                    extra_slice_every=2 if d % 4 == 0 else 0,
                    fill_fn=lambda i, d=d: bytes(
                        (d * 31 + i * 37 + j) % 256 for j in range(3 + (d + i) % 7)
                    ),
                )
                info = parse_mp4(payload)
                rows.append(
                    (
                        d,
                        info["n_frames"],
                        info["n_slices"],
                        info["n_idr"],
                        info["width"],
                        info["height"],
                        info["profile_idc"],
                        info["level_idc"],
                        info["length_size"],
                        info["bytes_walked"] == len(payload),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_frames",
                "n_slices",
                "n_idr",
                "width",
                "height",
                "profile_idc",
                "level_idc",
                "length_size",
                "extent_ok",
            ],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m25_webm_census",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             2 + doc_id % 6 AS n_video,
             1 + doc_id % 5 AS n_audio,
             1 + doc_id % 2 AS n_clusters,
             doc_id % 5 AS amode
      FROM documents WHERE doc_id % 41 = 7
    )
    SELECT doc_id,
           'webm' AS doc_type,
           CASE WHEN doc_id % 2 = 0 THEN 'V_VP9' ELSE 'V_VP8' END
             AS video_codec,
           'A_OPUS' AS audio_codec,
           CAST(64 + 16 * (doc_id % 4) AS BIGINT) AS width,
           CAST(48 + 16 * (doc_id % 3) AS BIGINT) AS height,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(n_video + CASE WHEN amode >= 2 THEN 1 ELSE n_audio END
                AS BIGINT) AS n_blocks,
           CAST(CASE WHEN amode = 1 THEN n_audio ELSE 0 END AS BIGINT)
             AS n_block_groups,
           CAST(n_clusters + CASE WHEN amode >= 2 THEN 1 ELSE 0 END
                AS BIGINT) AS n_keyframes,
           CAST(n_video + n_audio AS BIGINT) AS n_frames,
           CAST(CASE WHEN amode >= 2 THEN 1 ELSE 0 END AS BIGINT)
             AS n_laced,
           CAST(list_sum(list_transform(range(0, n_video),
                  k -> 10 + (doc_id * 13 + k * 7) % 50))
              + CASE WHEN amode = 4
                     THEN n_audio * (5 + (doc_id * 11) % 20)
                     ELSE list_sum(list_transform(range(0, n_audio),
                            k -> 5 + (doc_id * 11 + k * 3) % 20)) END
                AS BIGINT) AS media_bytes,
           CAST(33 * n_video AS BIGINT) AS duration_ms,
           TRUE AS mkv_agree,
           TRUE AS unknown_ok,
           TRUE AS extent_ok
    FROM m
    """,
    doc="WebM/MKV EBML container census (VERDICT r10 item 4 — WebM is "
    "the web's <video> container; a media census that only reads MP4 "
    "(m16) is blind to it): every 41st document carries a two-track "
    "(VP9|VP8 video + Opus audio) Matroska file built by the vendored "
    "EBML muxer (ebml.py — RFC 8794 vints, Info/Tracks/Cluster tree) "
    "and censused by the EBML walk: codec IDs, pixel dimensions, audio "
    "channels, cluster/block/keyframe counts, media payload bytes and "
    "duration all cross the parse. The fixture matrix exercises EVERY "
    "block shape real muxers emit by doc_id%5 — SimpleBlocks, "
    "BlockGroup/Block(+BlockDuration), Xiph lacing (255-spill sizes), "
    "EBML lacing (signed-vint deltas), and fixed-size lacing — plus "
    "both doc types: the SAME streams "
    "are wrapped twice (webm + matroska) and mkv_agree pins that both "
    "censuses agree field-for-field except DocType. unknown_ok (r12, "
    "VERDICT r11 item 4) additionally wraps the same stream with the "
    "all-ones UNKNOWN segment size (the live-stream capture shape; "
    "odd doc_ids also write every Cluster unknown-size) and pins that "
    "child-boundary resync censuses identically with the walk still "
    "covering every byte. extent_ok pins the "
    "walk covering the whole file. VP8/VP9/Opus payload decode is a "
    "named out-of-scope boundary (the m16/m22 doctrine). 100 TB shape: "
    "per-payload header walk in Arrow-batched mapInPandas, no shuffle.",
)
def m25_webm_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.ebml import encode_mkv, parse_mkv

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 41 == 7)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("doc_type", StringType(), True),
            StructField("video_codec", StringType(), True),
            StructField("audio_codec", StringType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("channels", LongType(), True),
            StructField("n_clusters", LongType(), True),
            StructField("n_blocks", LongType(), True),
            StructField("n_block_groups", LongType(), True),
            StructField("n_keyframes", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("n_laced", LongType(), True),
            StructField("media_bytes", LongType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("mkv_agree", BooleanType(), True),
            StructField("unknown_ok", BooleanType(), True),
            StructField("extent_ok", BooleanType(), True),
        ]
    )

    def build(d: int, doc_type: str, unknown: str | None = None):
        from tectonic_spark.operators.ebml import encode_mkv as _enc

        n_video = 2 + d % 6
        n_audio = 1 + d % 5
        n_clusters = 1 + d % 2
        amode = d % 5
        tracks = [
            {
                "number": 1,
                "type": "video",
                "codec_id": "V_VP9" if d % 2 == 0 else "V_VP8",
                "width": 64 + 16 * (d % 4),
                "height": 48 + 16 * (d % 3),
            },
            {
                "number": 2,
                "type": "audio",
                "codec_id": "A_OPUS",
                "sampling": 48000.0,
                "channels": 1 + d % 2,
            },
        ]
        vframes = [
            bytes((d * 31 + k * 17 + j) % 256 for j in range(10 + (d * 13 + k * 7) % 50))
            for k in range(n_video)
        ]
        if amode == 4:  # fixed lacing needs equal frame sizes
            aframes = [
                bytes((d * 19 + k * 11 + j) % 256
                      for j in range(5 + (d * 11) % 20))
                for k in range(n_audio)
            ]
        else:
            aframes = [
                bytes((d * 19 + k * 11 + j) % 256
                      for j in range(5 + (d * 11 + k * 3) % 20))
                for k in range(n_audio)
            ]
        clusters = [
            {"timestamp": ci * 100, "blocks": []} for ci in range(n_clusters)
        ]
        for k, fr in enumerate(vframes):
            clusters[k % n_clusters]["blocks"].append(
                # the first frame LANDING in each cluster is its keyframe
                {"track": 1, "frame": fr, "keyframe": k < n_clusters,
                 "offset": 33 * (k // n_clusters)}
            )
        if amode == 2:  # one Xiph-laced SimpleBlock carrying all frames
            clusters[-1]["blocks"].append({"track": 2, "frames": aframes})
        elif amode == 3:  # EBML lacing (signed-vint size deltas)
            clusters[-1]["blocks"].append(
                {"track": 2, "frames_ebml": aframes}
            )
        elif amode == 4:  # fixed-size lacing (equal frames, no table)
            clusters[-1]["blocks"].append(
                {"track": 2, "frames_fixed": aframes}
            )
        elif amode == 1:  # BlockGroup/Block each
            for k, fr in enumerate(aframes):
                clusters[-1]["blocks"].append(
                    {"track": 2, "group_frame": fr, "duration": 20,
                     "offset": 20 * k}
                )
        else:  # plain SimpleBlocks (not keyframe-flagged)
            for k, fr in enumerate(aframes):
                clusters[-1]["blocks"].append(
                    {"track": 2, "frame": fr, "offset": 20 * k}
                )
        return _enc(
            tracks,
            clusters,
            doc_type=doc_type,
            duration_ms=float(33 * n_video),
            unknown_size=unknown,
        )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = build(d, "webm")
                info = parse_mkv(payload)
                # both-container agreement pin: the identical streams
                # wrapped as matroska must census identically
                agree_keys = (
                    "tracks", "n_clusters", "n_blocks", "n_block_groups",
                    "n_keyframes", "n_frames", "n_laced_blocks",
                    "media_bytes", "duration_ms", "timestamp_scale",
                )
                info2 = parse_mkv(build(d, "matroska"))
                agree = info2["doc_type"] == "matroska" and all(
                    info[k] == info2[k] for k in agree_keys
                )
                # unknown-size pin (r12): the live-stream wrapping of
                # the SAME stream censuses identically, full coverage
                form = "segment" if d % 2 == 0 else "segment+clusters"
                ublob = build(d, "webm", unknown=form)
                info3 = parse_mkv(ublob)
                unknown_ok = info3["bytes_walked"] == len(ublob) and all(
                    info[k] == info3[k] for k in agree_keys
                )
                v, a = info["tracks"]
                rows.append(
                    (
                        d,
                        info["doc_type"],
                        v["codec_id"],
                        a["codec_id"],
                        v["width"],
                        v["height"],
                        a["channels"],
                        info["n_clusters"],
                        info["n_blocks"],
                        info["n_block_groups"],
                        info["n_keyframes"],
                        info["n_frames"],
                        info["n_laced_blocks"],
                        info["media_bytes"],
                        info["duration_ms"],
                        agree,
                        unknown_ok,
                        info["bytes_walked"] == len(payload),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "doc_type",
                "video_codec",
                "audio_codec",
                "width",
                "height",
                "channels",
                "n_clusters",
                "n_blocks",
                "n_block_groups",
                "n_keyframes",
                "n_frames",
                "n_laced",
                "media_bytes",
                "duration_ms",
                "mkv_agree",
                "unknown_ok",
                "extent_ok",
            ],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m27_avif_census",
    oracle="""
    SELECT doc_id,
           'avif' AS brand,
           CASE doc_id % 4 WHEN 0 THEN 'v0-file' WHEN 1 THEN 'v1-base'
                WHEN 2 THEN 'v1-idat' ELSE 'v2-file' END AS iloc_form,
           CAST(64 + 16 * (doc_id % 5) AS BIGINT) AS width,
           CAST(48 + 16 * (doc_id % 4) AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END
              + CASE WHEN doc_id % 7 = 2 AND doc_id % 4 IN (1, 3)
                     THEN 1 ELSE 0 END AS BIGINT) AS n_items,
           doc_id % 3 = 0 AS has_alpha,
           CAST(8 + 2 * (doc_id % 2) AS BIGINT) AS bit_depth,
           CAST(100 + (doc_id * 13) % 300
              + CASE WHEN doc_id % 3 = 0
                     THEN 50 + (doc_id * 7) % 100 ELSE 0 END
              + CASE WHEN doc_id % 7 = 2 AND doc_id % 4 IN (1, 3)
                     THEN 30 + doc_id % 40 ELSE 0 END AS BIGINT)
             AS total_item_bytes,
           CAST(CASE WHEN doc_id % 7 = 2 AND doc_id % 4 IN (1, 3)
                     THEN 1 ELSE 0 END AS BIGINT) AS n_method2,
           TRUE AS extents_ok
    FROM documents WHERE doc_id % 53 = 17
    """,
    doc="AVIF/HEIF image census (heif.py — AVIF is the web's fastest-"
    "growing image format, AV1 stills in the ISOBMFF item structure, "
    "so a census limited to JPEG/PNG/GIF/TIFF/WebP goes blind exactly "
    "where new crawls grow): every 53rd document carries a "
    "structurally complete AVIF built by the vendored writer (ftyp, "
    "meta with hdlr/pitm/iinf/iprp(ipco+ipma)/iloc/iref) and censused "
    "by the item walk — width/height come from the primary item's "
    "ipma->ispe ASSOCIATION (not the first ispe found), bit depth "
    "from pixi, alpha from the auxl reference edge plus the auxC urn, "
    "total_item_bytes from iloc extents each verified inside its "
    "housing span (extents_ok). The d%4 lane covers the iloc forms "
    "real HEICs ship (r12, VERDICT r11 item 3): v0 absolute file "
    "offsets, v1 with a 4-byte base_offset, v1 construction method 1 "
    "(payloads housed in meta's idat box, idat-relative extents), and "
    "v2 32-bit item IDs — iloc_form crosses version, construction "
    "method and extent verification per lane. Construction method 2 "
    "and nonzero extent_index stay named refusals (taxonomy tests). "
    "AV1 OBU payload decode is documented out (the m16/m25 codec-"
    "config boundary). 100 TB shape: per-payload header walk in "
    "Arrow-batched mapInPandas, no shuffle.",
)
def m27_avif_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.heif import encode_avif, parse_avif

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 53 == 17)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("brand", StringType(), True),
            StructField("iloc_form", StringType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("n_items", LongType(), True),
            StructField("has_alpha", BooleanType(), True),
            StructField("bit_depth", LongType(), True),
            StructField("total_item_bytes", LongType(), True),
            StructField("n_method2", LongType(), True),
            StructField("extents_ok", BooleanType(), True),
        ]
    )
    # the iloc-form lane: (name, encode_avif kwargs, expected method)
    lanes = [
        ("v0-file", dict(iloc_version=0), 0),
        ("v1-base", dict(iloc_version=1, base_offset=True), 0),
        ("v1-idat", dict(iloc_version=1, construction="idat"), 1),
        ("v2-file", dict(iloc_version=2), 0),
    ]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                prim = bytes(
                    (d * 31 + j) % 256 for j in range(100 + (d * 13) % 300)
                )
                alph = (
                    bytes((d * 17 + j) % 256 for j in range(50 + (d * 7) % 100))
                    if d % 3 == 0
                    else None
                )
                form, kwargs, want_method = lanes[d % 4]
                span = None
                if d % 7 == 2 and d % 4 in (1, 3):
                    span = (10 + d % 20, 30 + d % 40)
                payload = encode_avif(
                    width=64 + 16 * (d % 5),
                    height=48 + 16 * (d % 4),
                    primary_payload=prim,
                    alpha_payload=alph,
                    bit_depth=8 + 2 * (d % 2),
                    derived_span=span,
                    **kwargs,
                )
                info = parse_avif(payload)
                lane_ok = info["iloc_version"] == kwargs.get(
                    "iloc_version", 0
                ) and all(
                    m == (2 if iid == 3 else want_method)
                    for iid, m in info["methods"].items()
                )
                n_m2 = sum(1 for m in info["methods"].values() if m == 2)
                if span is not None:
                    lane_ok = lane_ok and info["extents"][3] == [span]
                rows.append(
                    (
                        d,
                        info["brand"],
                        form,
                        info["width"],
                        info["height"],
                        info["n_items"],
                        info["has_alpha"],
                        info["bit_depth"],
                        info["total_item_bytes"],
                        n_m2,
                        info["extents_ok"]
                        and lane_ok
                        and info["bytes_walked"] == len(payload),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "brand",
                "iloc_form",
                "width",
                "height",
                "n_items",
                "has_alpha",
                "bit_depth",
                "total_item_bytes",
                "n_method2",
                "extents_ok",
            ],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m26_opus_dual_container",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 7 AS BIGINT) AS n_packets,
           CAST(1 + doc_id % 7 AS BIGINT) AS n_frames,
           CAST((1 + doc_id % 7) * 960 AS BIGINT) AS toc_ogg,
           CAST((1 + doc_id % 7) * 960 AS BIGINT) AS toc_mkv,
           CAST(list_sum(list_transform(range(0, 1 + doc_id % 7),
                  k -> 40 + (doc_id * 13 + k * 37) % 180)) AS BIGINT)
             AS media_bytes,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(312 + doc_id % 100 AS BIGINT) AS pre_skip,
           TRUE AS containers_agree
    FROM documents WHERE doc_id % 43 = 11
    """,
    doc="Cross-container Opus agreement (the real-corpus situation m22 "
    "and m25 each see half of: the SAME audio stream ships in Ogg on "
    "one site and WebM on another, and a census that disagrees "
    "between containers is wrong in at least one): every 43rd "
    "document's Opus packet stream is wrapped TWICE — Ogg (RFC 3533 "
    "pages via ogg.py) and Matroska A_OPUS SimpleBlocks (ebml.py, "
    "parse_mkv(keep_frames=True)) — and the two walks must agree on "
    "packet count, payload bytes, and RFC 6716 TOC-derived duration, "
    "where the MKV side's duration comes from running "
    "opus_packet_samples over the frames the EBML walk extracted — "
    "the TOC accounting is container-independent, so a lacing or "
    "page-reassembly bug cannot agree with the other container. "
    "containers_agree is computed from the two parses, never assumed. "
    "100 TB shape: per-payload header walks in Arrow-batched "
    "mapInPandas, no shuffle.",
)
def m26_opus_dual_container(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.ebml import encode_mkv, parse_mkv
    from tectonic_spark.operators.ogg import (
        encode_ogg_opus,
        opus_packet_samples,
        parse_ogg,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 43 == 11)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_packets", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("toc_ogg", LongType(), True),
            StructField("toc_mkv", LongType(), True),
            StructField("media_bytes", LongType(), True),
            StructField("channels", LongType(), True),
            StructField("pre_skip", LongType(), True),
            StructField("containers_agree", BooleanType(), True),
        ]
    )

    def packets_for(d: int) -> list[bytes]:
        toc = (1 << 3) | ((d % 2) << 2)  # 20 ms SILK, stereo bit
        out = []
        for k in range(1 + d % 7):
            size = 40 + (d * 13 + k * 37) % 180
            out.append(bytes([toc]) + bytes((d * 7 + j) % 256 for j in range(size - 1)))
        return out

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                packets = packets_for(d)
                channels = 1 + d % 2
                pre_skip = 312 + d % 100
                ogg_blob = encode_ogg_opus(
                    packets, channels=channels, pre_skip=pre_skip
                )
                o = parse_ogg(ogg_blob)["streams"][0]
                # clusters hold CONTIGUOUS time ranges (how real muxers
                # cut them) — packets stay in stream order across them
                n_clusters = 1 + d % 2
                half = (len(packets) + n_clusters - 1) // n_clusters
                clusters = []
                for ci in range(n_clusters):
                    chunk = packets[ci * half : (ci + 1) * half]
                    clusters.append(
                        {
                            "timestamp": ci * half * 20,
                            "blocks": [
                                {"track": 1, "frame": p, "offset": 20 * k,
                                 "keyframe": True}
                                for k, p in enumerate(chunk)
                            ],
                        }
                    )
                mkv_blob = encode_mkv(
                    [
                        {
                            "number": 1,
                            "type": "audio",
                            "codec_id": "A_OPUS",
                            "sampling": 48000.0,
                            "channels": channels,
                        }
                    ],
                    clusters,
                )
                m = parse_mkv(mkv_blob, keep_frames=True)
                frames = [fr for tr, fr in m["frames"] if tr == 1]
                toc_mkv = sum(opus_packet_samples(fr) for fr in frames)
                # the Ogg stream carries OpusHead + OpusTags as its two
                # header packets (RFC 7845); Matroska moves them into
                # CodecPrivate, so the audio packet count is n - 2
                n_audio_ogg = o["n_packets"] - 2
                agree = (
                    n_audio_ogg == m["n_frames"]
                    and o["toc_duration_samples"] == toc_mkv
                    and m["media_bytes"] == sum(len(p) for p in packets)
                    and b"".join(frames) == b"".join(packets)
                )
                rows.append(
                    (
                        d,
                        n_audio_ogg,
                        m["n_frames"],
                        o["toc_duration_samples"],
                        toc_mkv,
                        m["media_bytes"],
                        o["channels"],
                        o["pre_skip"],
                        agree,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_packets",
                "n_frames",
                "toc_ogg",
                "toc_mkv",
                "media_bytes",
                "channels",
                "pre_skip",
                "containers_agree",
            ],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m23_id3_extract",
    oracle="""
    SELECT doc_id,
           'Track ' || CAST(doc_id AS VARCHAR) AS title,
           'Artist ' || CAST(doc_id % 9 AS VARCHAR) AS artist,
           'Album ' || CAST(doc_id % 5 AS VARCHAR) AS album,
           CAST(1 + doc_id % 20 AS BIGINT) AS track,
           CAST(1990 + doc_id % 35 AS BIGINT) AS yr,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS BIGINT)
             AS tag_version,
           CAST(3 + doc_id % 6 AS BIGINT) AS n_frames,
           CAST(8 AS BIGINT) AS apic_w,
           CAST(list_sum(list_transform(range(0, 64),
                i -> (doc_id * 7 + i * 13) % 256)) AS BIGINT) AS apic_px_sum,
           CAST(doc_id % 80 AS BIGINT) AS genre,
           CAST(1 + doc_id % 20 AS BIGINT) AS v1_track
    FROM documents WHERE doc_id % 47 = 13
    """,
    doc="ID3 tag extraction (r10, id3.py — the audio analog of m21 EXIF: "
    "crawl pipelines read title/artist/album and embedded cover art "
    "before dedup): each payload is a real MP3 stream sandwiched "
    "between an ID3v2 tag (v2.4 for even doc_ids / v2.3 for odd — "
    "syncsafe vs plain frame sizes; text encoding CYCLES latin-1/"
    "utf-16/utf-16be/utf-8 by doc_id; every third tag body is "
    "UNSYNCHRONIZED per §5, exercising the FF 00 reversal) and an "
    "ID3v1.1 trailer (genre byte + track-in-comment). The APIC frame "
    "carries a REAL PNG that routes through the engine's own decoder "
    "(decode_png) for dimensions and pixel sum — album art "
    "participates in the codec family. n_frames comes from parse_mp3 "
    "over the SAME payload, pinning that the audio walker's tag skip "
    "and this parser agree on the tag boundary. Year reads TDRC (v2.4) "
    "or TYER (v2.3) — the spec-correct frame per version. 100 TB "
    "shape: per-payload header parsing in mapInPandas, no shuffle.",
)
def m23_id3_extract(spark, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 47 == 13)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("title", StringType(), True),
            StructField("artist", StringType(), True),
            StructField("album", StringType(), True),
            StructField("track", LongType(), True),
            StructField("yr", LongType(), True),
            StructField("tag_version", LongType(), True),
            StructField("n_frames", LongType(), True),
            StructField("apic_w", LongType(), True),
            StructField("apic_px_sum", LongType(), True),
            StructField("genre", LongType(), True),
            StructField("v1_track", LongType(), True),
        ]
    )

    def payload_of(d: int) -> bytes:
        from tectonic_spark.operators.codecs import encode_mp3_frames
        from tectonic_spark.operators.id3 import (
            build_apic_frame,
            build_id3v1,
            build_id3v2,
            build_text_frame,
        )
        from tectonic_spark.operators.png import encode_png

        ver = 4 if d % 2 == 0 else 3
        enc = d % 4
        i = np.arange(64, dtype=np.int64)
        art = ((d * 7 + i * 13) % 256).astype(np.uint8).reshape(8, 8)
        frames = [
            build_text_frame("TIT2", f"Track {d}", enc),
            build_text_frame("TPE1", f"Artist {d % 9}", enc),
            build_text_frame("TALB", f"Album {d % 5}", enc),
            build_text_frame("TRCK", f"{1 + d % 20}/20", enc),
            build_text_frame(
                "TDRC" if ver == 4 else "TYER", str(1990 + d % 35), enc
            ),
            build_apic_frame(encode_png(art), "image/png", desc=f"cover {d}"),
        ]
        tag = build_id3v2(frames, version=ver, unsync=(d % 3 == 0))
        audio = encode_mp3_frames(3 + d % 6, bitrate_idx=9, fill=d % 100)
        v1 = build_id3v1(
            title=f"Track {d}"[:30],
            artist=f"Artist {d % 9}",
            album=f"Album {d % 5}",
            year=str(1990 + d % 35),
            comment="c",
            track=1 + d % 20,
            genre=d % 80,
        )
        return tag + audio + v1

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.codecs import parse_mp3
        from tectonic_spark.operators.id3 import parse_id3v1, parse_id3v2
        from tectonic_spark.operators.png import decode_png

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = payload_of(d)
                tag = parse_id3v2(payload)
                v1 = parse_id3v1(payload)
                if v1 is None:
                    raise ValueError(f"doc {d}: missing ID3v1 trailer")
                audio = parse_mp3(payload)  # skips both tags itself
                (pic,) = tag["pictures"]
                if pic["mime"] != "image/png":
                    raise ValueError(f"doc {d}: unexpected APIC mime")
                art = decode_png(pic["image"])
                year_txt = tag["text"].get("TDRC") or tag["text"]["TYER"]
                rows.append(
                    (
                        d,
                        tag["text"]["TIT2"],
                        tag["text"]["TPE1"],
                        tag["text"]["TALB"],
                        int(tag["text"]["TRCK"].split("/")[0]),
                        int(year_txt[:4]),
                        tag["version"],
                        audio["n_frames"],
                        art.shape[1],
                        int(np.sum(art, dtype=np.int64)),
                        v1["genre"],
                        v1["track"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "title",
                    "artist",
                    "album",
                    "track",
                    "yr",
                    "tag_version",
                    "n_frames",
                    "apic_w",
                    "apic_px_sum",
                    "genre",
                    "v1_track",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m24_pdf_extract",
    oracle="""
    WITH d AS (SELECT doc_id, text, n_chars, 1 + doc_id % 3 AS np
               FROM documents WHERE doc_id % 59 = 17)
    SELECT doc_id,
           CAST(np AS BIGINT) AS n_pages,
           CAST(n_chars AS BIGINT) AS chars,
           'doc ' || CAST(doc_id AS VARCHAR) AS title,
           doc_id % 3 = 0 AS xref_stream,
           CAST(CASE WHEN doc_id % 6 = 0 THEN 4 + np ELSE 0 END AS BIGINT)
             AS n_compressed,
           CAST((CASE WHEN doc_id % 2 = 0 THEN np ELSE 0 END)
                + (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                + (CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flate
    FROM d
    """,
    doc="PDF text extraction + census (r10, pdf.py — after HTML the "
    "highest-volume crawl document format): each doc renders as a real "
    "PDF across a layout matrix — 1-3 pages, FlateDecode'd content "
    "streams for even doc_ids, cross-reference STREAMS (type /XRef, "
    "W-packed rows under the PNG Up predictor) every third doc, "
    "compressed object streams (/ObjStm, the PDF 1.5+ layout with "
    "type-2 xref entries) every sixth, kerned TJ arrays every fifth — "
    "then parsed back: COS object grammar, xref resolution, stream "
    "inflation, page-tree walk, BT/ET text-operator interpretation "
    "(Tj/TJ/Td line logic). chars counts the EXTRACTED text "
    "re-joined across lines and pages, so it equals n_chars only if "
    "extraction inverted the layout exactly; xref_stream/n_compressed/"
    "n_flate come from the PARSER's census, not the fixture arithmetic. "
    "Encrypted PDFs and DCTDecode image XObjects are documented out "
    "(censused, not decoded). 100 TB shape: per-payload parsing in "
    "mapInPandas, no shuffle.",
)
def m24_pdf_extract(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 59 == 17)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_pages", LongType(), True),
            StructField("chars", LongType(), True),
            StructField("title", StringType(), True),
            StructField("xref_stream", BooleanType(), True),
            StructField("n_compressed", LongType(), True),
            StructField("n_flate", LongType(), True),
        ]
    )

    def pdf_of(d: int, text: str) -> bytes:
        from tectonic_spark.operators.pdf import build_pdf

        words = text.split(" ")
        lines = [" ".join(words[i : i + 8]) for i in range(0, len(words), 8)]
        np_ = 1 + d % 3
        per = (len(lines) + np_ - 1) // np_
        pages = [lines[i : i + per] for i in range(0, len(lines), per)]
        while len(pages) < np_:  # short docs: pad with empty pages
            pages.append([])
        return build_pdf(
            pages,
            compress=(d % 2 == 0),
            xref_stream=(d % 3 == 0),
            objstm=(d % 6 == 0),
            use_tj_array=(d % 5 == 0),
            title=f"doc {d}",
        )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.pdf import analyze_pdf

        for pdf_batch in batches:
            rows = []
            for doc_id, text in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                d = int(doc_id)
                payload = pdf_of(d, text)
                info, pages = analyze_pdf(payload)  # one parse, both surfaces
                rejoined = " ".join(
                    ln for pg in pages for ln in pg.split("\n") if ln
                )
                if rejoined != text:
                    raise ValueError(f"doc {d}: extraction drift")
                rows.append(
                    (
                        d,
                        info["n_pages"],
                        len(rejoined),
                        info["title"],
                        info["uses_xref_stream"],
                        info["n_compressed_objects"],
                        info["filters"].get("/FlateDecode", 0),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_pages",
                    "chars",
                    "title",
                    "xref_stream",
                    "n_compressed",
                    "n_flate",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m28_woff2_census",
    oracle="""
    SELECT doc_id, 'ttf' AS flavor, CAST(8 AS BIGINT) AS n_tables,
           CAST(1000 + (doc_id % 5) * 24 AS BIGINT) AS units_per_em,
           CAST(10 + doc_id % 50 AS BIGINT) AS num_glyphs,
           CAST(doc_id % 2 AS BIGINT) AS loca_format,
           CAST(157 + 4 * (10 + doc_id % 50) + 100 + (doc_id * 11) % 200
              + (11 + doc_id % 50) * (2 + 2 * (doc_id % 2)) AS BIGINT)
             AS total_orig_bytes,
           CASE doc_id % 3 WHEN 0 THEN 'lz' WHEN 1 THEN 'dict'
                ELSE 'literals' END AS br_mode,
           CAST(CASE WHEN doc_id % 4 = 1 THEN 31 ELSE 0 END AS BIGINT)
             AS meta_orig_len,
           TRUE AS census_ok
    FROM documents WHERE doc_id % 61 = 19
    """,
    doc="WOFF2 web-font census (woff2.py — every modern page pulls "
    ".woff2, and the format is the r13 brotli work's natural rider: "
    "the entire sfnt table payload is ONE brotli stream, real-world "
    "emitted at the qualities whose static-dictionary references and "
    "UTF8 contexts the vendored decoder now handles): every 61st "
    "document carries an 8-table font built by the vendored writer "
    "(head/hhea/hmtx/maxp/name/cmap/glyf/loca, null transforms, "
    "known-tag directory indexes, UIntBase128 lengths) and censused "
    "by the walk — units_per_em/loca_format read out of the "
    "DECOMPRESSED head table, num_glyphs from maxp, and census_ok "
    "folds the spec arithmetic (totalSfntSize recomputed from "
    "4-aligned origLengths, decompressed stream length == sum of "
    "table lengths, every file byte accounted) plus "
    "num_hmetrics==num_glyphs and the exact tag set. The d%3 lane "
    "cycles the brotli encoder's lz/dict/literals modes — the dict "
    "lane puts genuine RFC 7932 static-dictionary references inside "
    "a font file — and every 4th doc adds the brotli-compressed "
    "extended-metadata block (meta_orig_len pins its decoded "
    "length). The glyf/loca preprocessing transform is a named "
    "refusal (taxonomy-tested); known-tag indexes past the "
    "transcribed head of W3C Table 1 census as '#<n>'. 100 TB shape: "
    "per-payload walk + one in-task brotli decode in Arrow-batched "
    "mapInPandas, no shuffle.",
)
def m28_woff2_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.woff2 import encode_woff2, parse_woff2

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 61 == 19)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("flavor", StringType(), True),
            StructField("n_tables", LongType(), True),
            StructField("units_per_em", LongType(), True),
            StructField("num_glyphs", LongType(), True),
            StructField("loca_format", LongType(), True),
            StructField("total_orig_bytes", LongType(), True),
            StructField("br_mode", StringType(), True),
            StructField("meta_orig_len", LongType(), True),
            StructField("census_ok", BooleanType(), True),
        ]
    )
    want_tags = ["cmap", "glyf", "head", "hhea", "hmtx", "loca", "maxp",
                 "name"]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                upem = 1000 + (d % 5) * 24
                ng = 10 + d % 50
                lf = d % 2
                head = bytearray(54)
                head[12:16] = struct.pack(">I", 0x5F0F3CF5)
                head[18:20] = struct.pack(">H", upem)
                head[50:52] = struct.pack(">h", lf)
                glyf = bytes((d * 7 + j) % 256
                             for j in range(100 + (d * 11) % 200))
                tables = [
                    (b"head", bytes(head)),
                    (b"maxp", struct.pack(">IH", 0x00010000, ng)
                     + b"\x00" * 26),
                    (b"hhea", b"\x00" * 34 + struct.pack(">H", ng)),
                    (b"hmtx", bytes(4 * ng)),
                    (b"glyf", glyf),
                    (b"loca", bytes((ng + 1) * (2 + 2 * lf))),
                    (b"name", b"Doc Font %06d" % d),
                    (b"cmap", bytes(20)),
                ]
                mode = ("lz", "dict", "literals")[d % 3]
                meta = (
                    b"<metadata>doc %06d</metadata>" % d
                    if d % 4 == 1
                    else None
                )
                payload = encode_woff2(tables, br_mode=mode, metadata=meta)
                info = parse_woff2(payload)
                rows.append(
                    (
                        d,
                        info["flavor"],
                        info["n_tables"],
                        info["units_per_em"],
                        info["num_glyphs"],
                        info["loca_format"],
                        info["total_orig_bytes"],
                        mode,
                        info["meta_orig_len"],
                        info["sfnt_size_ok"]
                        and info["stream_ok"]
                        and info["bytes_walked"] == len(payload)
                        and info["num_hmetrics"] == info["num_glyphs"]
                        and info["tags"] == want_tags,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "flavor",
                    "n_tables",
                    "units_per_em",
                    "num_glyphs",
                    "loca_format",
                    "total_orig_bytes",
                    "br_mode",
                    "meta_orig_len",
                    "census_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m29_font_reconstruct",
    oracle="""
    SELECT doc_id,
           CAST(6 + doc_id % 9 AS BIGINT) AS num_glyphs,
           CAST(4 * ((6 + doc_id % 9 + 3) // 4)
              + 8 * ((6 + doc_id % 9) // 4) AS BIGINT) AS n_points,
           CAST((6 + doc_id % 9 + 3) // 4
              + 2 * ((6 + doc_id % 9) // 4) AS BIGINT) AS n_contours,
           CAST((6 + doc_id % 9 + 1) // 4 AS BIGINT) AS n_composites,
           CAST((6 + doc_id % 9 + 2) // 4 AS BIGINT) AS n_empty_glyphs,
           CAST(CASE WHEN doc_id % 5 = 2 THEN (6 + doc_id % 9) // 4
                ELSE 0 END AS BIGINT) AS n_overlap,
           CAST((6 + doc_id % 9 + 1) // 4
              + CASE WHEN doc_id % 2 = 0 THEN (6 + doc_id % 9 + 3) // 4
                ELSE 0 END AS BIGINT) AS n_explicit_bbox,
           CAST(doc_id % 2 AS BIGINT) AS loca_format,
           CASE doc_id % 3 WHEN 0 THEN 'lz' WHEN 1 THEN 'dict'
                ELSE 'literals' END AS br_mode,
           TRUE AS reconstruct_ok
    FROM documents WHERE doc_id % 63 = 23
    """,
    doc="WOFF2 glyf/loca preprocessing transform + full sfnt "
    "reconstruction (woff2.py §5.1-5.3 — the transform real tools "
    "emit by default, closing m28's named refusal): every 63rd "
    "document carries a font whose glyph set cycles "
    "simple/empty/composite/multi-contour kinds (g%4), with point "
    "deltas spanning every §5.2 triplet size class, off-curve "
    "points, instructions, an overlap-bitmap lane (d%5==2), an "
    "explicit-bbox lane (d%2==0) and F2Dot14-scaled composite "
    "components. The glyf table rides the transform (seven "
    "sub-streams, 255UInt16 counts, transformed-loca empty) inside "
    "the WOFF2 brotli stream (d%3 cycles the encoder's "
    "lz/dict/literals lanes); the census DECODES it — triplet by "
    "triplet — and reconstruct_ok folds: reconstructed glyf AND "
    "loca byte-equal to the independent direct serialization, "
    "directory origLengths matched exactly, head.indexToLocFormat "
    "== transform indexFormat, maxp.numGlyphs == transform "
    "numGlyphs, the spec arithmetic (sfnt_size_ok/stream_ok/every "
    "byte walked), plus the sfnt layer: the de-transformed tables "
    "reassembled into a real OpenType binary whose directory "
    "checksums, searchRange family and head.checkSumAdjustment all "
    "re-verify from bytes (whole-font checksum == 0xB1B0AFBA). "
    "100 TB shape: per-payload transform decode in Arrow-batched "
    "mapInPandas, no shuffle, font bytes never leave the task.",
)
def m29_font_reconstruct(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.woff2 import (
        _table_checksum,
        build_glyf,
        encode_woff2,
        glyph_composite,
        glyph_simple,
        parse_woff2,
        reconstruct_sfnt,
        transform_glyf,
        verify_sfnt,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 63 == 23)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("num_glyphs", LongType(), True),
            StructField("n_points", LongType(), True),
            StructField("n_contours", LongType(), True),
            StructField("n_composites", LongType(), True),
            StructField("n_empty_glyphs", LongType(), True),
            StructField("n_overlap", LongType(), True),
            StructField("n_explicit_bbox", LongType(), True),
            StructField("loca_format", LongType(), True),
            StructField("br_mode", StringType(), True),
            StructField("reconstruct_ok", BooleanType(), True),
        ]
    )

    def glyphs_of(d: int) -> list:
        ng = 6 + d % 9
        overlap = d % 5 == 2
        out: list = []
        for g in range(ng):
            kind = g % 4
            if kind == 1:
                out.append(None)
            elif kind == 0:
                bx, by = (d % 37) * 7, (d % 23) * 5
                w, h = 40 + (d % 7) * 90, 80 + (d % 11) * 35
                out.append(glyph_simple(
                    [[(bx, by, True), (bx + w, by, d % 2 == 0),
                      (bx + w, by + h, True), (bx, by + h, True)]],
                    instructions=b"\x01\x02"[: d % 3],
                ))
            elif kind == 2:
                out.append(glyph_composite(
                    [{"glyph_index": (g + 1) % ng, "dx": 5 + d % 120,
                      "dy": -3 - d % 50,
                      "scale": 0.5 if d % 3 == 0 else None},
                     {"glyph_index": (g + 2) % ng,
                      "dx": 200 + 150 * (d % 2), "dy": -200,
                      "scale": None}],
                    bbox=(-10 - d % 20, -10, 600 + d % 30, 900),
                    instructions=b"\xAA" if d % 2 == 0 else b"",
                ))
            else:
                out.append(glyph_simple(
                    [[(0, 0, True), (300 + (d % 13) * 400, 0, True),
                      (5, 700, False)],
                     [(-1000 - (d % 5) * 800, -50, True),
                      (2000, 3000, True), (-4000, 100, False),
                      (7, 8, True), (9, 10, True)]],
                    overlap=overlap,
                ))
        return out

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                glyphs = glyphs_of(d)
                ng = len(glyphs)
                lf = d % 2
                mode = ("lz", "dict", "literals")[d % 3]
                explicit = (
                    {g for g in range(ng) if g % 4 == 0}
                    if d % 2 == 0
                    else set()
                )
                glyf, loca = build_glyf(glyphs, lf)
                head = bytearray(54)
                head[12:16] = struct.pack(">I", 0x5F0F3CF5)
                head[18:20] = struct.pack(">H", 1000 + (d % 5) * 24)
                head[50:52] = struct.pack(">h", lf)
                tables = [
                    (b"head", bytes(head)),
                    (b"maxp", struct.pack(">IH", 0x00010000, ng)
                     + b"\x00" * 26),
                    (b"hhea", b"\x00" * 34 + struct.pack(">H", ng)),
                    (b"hmtx", bytes(4 * ng)),
                    (b"glyf", glyf),
                    (b"loca", loca),
                    (b"cmap", bytes(20)),
                ]
                payload = encode_woff2(
                    tables,
                    br_mode=mode,
                    transformed={
                        b"glyf": transform_glyf(
                            glyphs, lf, explicit_bbox=explicit
                        ),
                        b"loca": b"",
                    },
                )
                info = parse_woff2(payload, keep_tables=True)
                got = dict(info["table_bytes"])
                sfnt = reconstruct_sfnt(info["table_bytes"])
                v = verify_sfnt(sfnt)
                ok = (
                    info["glyf_transformed"]
                    and info["sfnt_size_ok"]
                    and info["stream_ok"]
                    and info["bytes_walked"] == len(payload)
                    and got[b"glyf"] == glyf
                    and got[b"loca"] == loca
                    and v["search_ok"]
                    and v["checksums_ok"]
                    and bool(v["adjustment_ok"])
                    and _table_checksum(sfnt) == 0xB1B0AFBA
                )
                rows.append(
                    (d, info["num_glyphs"], info["n_points"],
                     info["n_contours"], info["n_composites"],
                     info["n_empty_glyphs"], info["n_overlap"],
                     info["n_explicit_bbox"], info["loca_format"],
                     mode, ok)
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "num_glyphs", "n_points", "n_contours",
                     "n_composites", "n_empty_glyphs", "n_overlap",
                     "n_explicit_bbox", "loca_format", "br_mode",
                     "reconstruct_ok"],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m30_woff1_census",
    oracle="""
    SELECT doc_id, 'ttf' AS flavor, CAST(8 AS BIGINT) AS n_tables,
           CAST(1000 + (doc_id % 5) * 24 AS BIGINT) AS units_per_em,
           CAST(10 + doc_id % 50 AS BIGINT) AS num_glyphs,
           CAST(doc_id % 2 AS BIGINT) AS loca_format,
           CAST(190 + 4 * (10 + doc_id % 50) + 4 * (25 + doc_id % 50)
              + (11 + doc_id % 50) * (2 + 2 * (doc_id % 2)) AS BIGINT)
             AS total_orig_bytes,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS n_stored,
           CAST(CASE WHEN doc_id % 4 = 1 THEN 31 ELSE 0 END AS BIGINT)
             AS meta_orig_len,
           TRUE AS census_ok
    FROM documents WHERE doc_id % 71 = 29
    """,
    doc="WOFF 1.0 web-font census (woff2.py encode_woff1/parse_woff1 "
    "— the zlib-era sibling older crawls still serve; per-table "
    "compression instead of WOFF2's one brotli stream): every 71st "
    "document carries an 8-table font where each table rides its own "
    "zlib stream, the d%3==1 lane forces glyf STORED (compLength == "
    "origLength, the spec's store-when-bigger path), and every 4th "
    "doc adds the zlib-compressed extended-metadata block. census_ok "
    "folds: per-table inflate lengths == origLength, every "
    "origChecksum re-verified from bytes (head's with its "
    "checkSumAdjustment zeroed), totalSfntSize recomputed from "
    "4-aligned origLengths, byte accounting, sorted directory, "
    "num_hmetrics==num_glyphs, the exact tag set, AND the decoded "
    "tables reassembled through the sfnt layer with all checksums "
    "re-verifying. 100 TB shape: per-payload walk + per-table "
    "inflate in Arrow-batched mapInPandas, no shuffle.",
)
def m30_woff1_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.woff2 import (
        encode_woff1,
        parse_woff1,
        reconstruct_sfnt,
        verify_sfnt,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 71 == 29)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("flavor", StringType(), True),
            StructField("n_tables", LongType(), True),
            StructField("units_per_em", LongType(), True),
            StructField("num_glyphs", LongType(), True),
            StructField("loca_format", LongType(), True),
            StructField("total_orig_bytes", LongType(), True),
            StructField("n_stored", LongType(), True),
            StructField("meta_orig_len", LongType(), True),
            StructField("census_ok", BooleanType(), True),
        ]
    )
    want_tags = ["cmap", "glyf", "head", "hhea", "hmtx", "loca", "maxp",
                 "name"]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                upem = 1000 + (d % 5) * 24
                ng = 10 + d % 50
                lf = d % 2
                head = bytearray(54)
                head[12:16] = struct.pack(">I", 0x5F0F3CF5)
                head[18:20] = struct.pack(">H", upem)
                head[50:52] = struct.pack(">h", lf)
                # every table compressible (repetitive motifs) so the
                # stored count is the forced lane, exactly
                glyf = struct.pack(">I", d & 0xFFFFFFFF) * (25 + d % 50)
                tables = [
                    (b"head", bytes(head)),
                    (b"maxp", struct.pack(">IH", 0x00010000, ng)
                     + b"\x00" * 26),
                    (b"hhea", b"\x00" * 34 + struct.pack(">H", ng)),
                    (b"hmtx", bytes(4 * ng)),
                    (b"glyf", glyf),
                    (b"loca", bytes((ng + 1) * (2 + 2 * lf))),
                    (b"name", (b"Doc Font %06d " % d) * 3),
                    (b"cmap", bytes(20)),
                ]
                meta = (
                    b"<metadata>doc %06d</metadata>" % d
                    if d % 4 == 1
                    else None
                )
                store = frozenset({b"glyf"}) if d % 3 == 1 else frozenset()
                payload = encode_woff1(
                    tables, metadata=meta, store_tags=store
                )
                info = parse_woff1(payload, keep_tables=True)
                v = verify_sfnt(reconstruct_sfnt(info["table_bytes"]))
                rows.append(
                    (
                        d,
                        info["flavor"],
                        info["n_tables"],
                        info["units_per_em"],
                        info["num_glyphs"],
                        info["loca_format"],
                        info["total_orig_bytes"],
                        info["n_stored"],
                        info["meta_orig_len"],
                        info["sfnt_size_ok"]
                        and info["checksums_ok"]
                        and info["bytes_walked"] == len(payload)
                        and info["num_hmetrics"] == info["num_glyphs"]
                        and info["tags"] == want_tags
                        and v["search_ok"]
                        and v["checksums_ok"]
                        and bool(v["adjustment_ok"]),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "flavor", "n_tables", "units_per_em",
                     "num_glyphs", "loca_format", "total_orig_bytes",
                     "n_stored", "meta_orig_len", "census_ok"],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m31_font_metrics",
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 12 AS BIGINT) AS num_glyphs,
           CAST(8 + doc_id % 12 - doc_id % 3 AS BIGINT) AS n_hmetrics,
           CAST(doc_id % 3 AS BIGINT) AS n_short,
           CAST((8 + doc_id % 12 - doc_id % 3) * (400 + doc_id % 80)
              + 3 * (8 + doc_id % 12 - doc_id % 3)
                  * (8 + doc_id % 12 - doc_id % 3 - 1) / 2
              + (doc_id % 3) * ((400 + doc_id % 80)
                  + 3 * (8 + doc_id % 12 - doc_id % 3 - 1)) AS BIGINT)
             AS sum_advance,
           CAST(2 AS BIGINT) AS n_segments,
           CAST(8 + doc_id % 12 + 3 + doc_id % 4 AS BIGINT) AS n_mapped,
           CAST(3 + doc_id % 4 AS BIGINT) AS n_gia,
           TRUE AS metrics_ok
    FROM documents WHERE doc_id % 73 = 31
    """,
    doc="Font METRICS census (operators/sfnt.py riding the m29 "
    "container stack — character coverage and advance widths are "
    "what a crawl-side font pipeline actually queries): every 73rd "
    "document carries a WOFF2 font (glyf/loca TRANSFORMED, so the "
    "full §5 decode runs under this query too) whose cmap is a real "
    "format-4 subtable — one arithmetic idDelta segment (latin run) "
    "plus one REVERSED run that must take the idRangeOffset "
    "glyphIdArray indirection (the from-the-slot pointer-arithmetic "
    "lane), 0xFFFF terminator, searchRange family validated — and "
    "whose hmtx uses the SHORT form (d%3 trailing lsb-only glyphs "
    "inheriting the last advance). The census de-transforms the "
    "container, re-verifies the sfnt checksum layer, then decodes "
    "cmap and hmtx out of the reconstructed tables; metrics_ok folds "
    "mapping == fixture mapping exactly, hmtx advances/lsbs "
    "recovered exactly (sum_advance closed-form under the oracle), "
    "search arithmetic, and the container verdicts. 100 TB shape: "
    "per-payload decode in Arrow-batched mapInPandas, no shuffle.",
)
def m31_font_metrics(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.sfnt import (
        build_cmap4,
        build_hmtx,
        parse_cmap4,
        parse_hmtx,
    )
    from tectonic_spark.operators.woff2 import (
        build_glyf,
        encode_woff2,
        glyph_simple,
        parse_woff2,
        reconstruct_sfnt,
        transform_glyf,
        verify_sfnt,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 73 == 31)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("num_glyphs", LongType(), True),
            StructField("n_hmetrics", LongType(), True),
            StructField("n_short", LongType(), True),
            StructField("sum_advance", LongType(), True),
            StructField("n_segments", LongType(), True),
            StructField("n_mapped", LongType(), True),
            StructField("n_gia", LongType(), True),
            StructField("metrics_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ng = 8 + d % 12
                nh = ng - d % 3
                a0 = 400 + d % 80
                k = 3 + d % 4
                lf = d % 2
                glyphs = [None] + [
                    glyph_simple(
                        [[(g * 10, 0, True), (g * 10 + 30 + d % 5, 0, True),
                          (g * 10, 40, True)]]
                    )
                    for g in range(1, ng)
                ]
                adv = [a0 + 3 * g for g in range(nh)]
                adv += [a0 + 3 * (nh - 1)] * (ng - nh)
                lsb = [-20 + g for g in range(ng)]
                mapping = {65 + i: i + 1 for i in range(ng)}
                mapping.update(
                    {0x100 + i: ng - 1 - i for i in range(k)}
                )
                glyf, loca = build_glyf(glyphs, lf)
                head = bytearray(54)
                head[12:16] = struct.pack(">I", 0x5F0F3CF5)
                head[18:20] = struct.pack(">H", 1000)
                head[50:52] = struct.pack(">h", lf)
                tables = [
                    (b"head", bytes(head)),
                    (b"maxp", struct.pack(">IH", 0x00010000, ng)
                     + b"\x00" * 26),
                    (b"hhea", b"\x00" * 34 + struct.pack(">H", nh)),
                    (b"hmtx", build_hmtx(adv, lsb, nh)),
                    (b"glyf", glyf),
                    (b"loca", loca),
                    (b"cmap", build_cmap4(mapping)),
                ]
                payload = encode_woff2(
                    tables,
                    br_mode=("lz", "dict", "literals")[d % 3],
                    transformed={
                        b"glyf": transform_glyf(glyphs, lf),
                        b"loca": b"",
                    },
                )
                info = parse_woff2(payload, keep_tables=True)
                got = dict(info["table_bytes"])
                v = verify_sfnt(reconstruct_sfnt(info["table_bytes"]))
                cm = parse_cmap4(got[b"cmap"])
                hm = parse_hmtx(got[b"hmtx"], nh, ng)
                ok = (
                    info["glyf_transformed"]
                    and info["sfnt_size_ok"]
                    and info["stream_ok"]
                    and info["bytes_walked"] == len(payload)
                    and got[b"glyf"] == glyf
                    and v["checksums_ok"]
                    and bool(v["adjustment_ok"])
                    and v["search_ok"]
                    and cm["mapping"] == mapping
                    and cm["search_ok"]
                    and hm["advances"] == adv
                    and hm["lsbs"] == lsb
                )
                rows.append(
                    (d, ng, nh, d % 3, hm["sum_advance"],
                     cm["n_segments"], len(cm["mapping"]),
                     cm["n_glyph_id_array"], ok)
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "num_glyphs", "n_hmetrics", "n_short",
                     "sum_advance", "n_segments", "n_mapped", "n_gia",
                     "metrics_ok"],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m32_cff_census",
    oracle="""
    SELECT doc_id,
           CAST(5 + doc_id % 10 AS BIGINT) AS n_glyphs,
           CAST(2 * (5 + doc_id % 10) + 3 * ((5 + doc_id % 10) // 3)
              + CASE WHEN (5 + doc_id % 10) % 3 = 2 THEN 1 ELSE 0 END
              AS BIGINT) AS n_points,
           CAST((5 + doc_id % 10 + 1) // 2 AS BIGINT) AS n_stems,
           CAST((5 + doc_id % 10 - (5 + doc_id % 10) // 4)
                  * (100 + doc_id % 50)
              + ((5 + doc_id % 10) * (5 + doc_id % 10 - 1) // 2
                 - 2 * ((5 + doc_id % 10) // 4) * ((5 + doc_id % 10) // 4)
                 - (5 + doc_id % 10) // 4)
              + ((5 + doc_id % 10) // 4) * (77 + doc_id % 20)
              AS BIGINT) AS sum_width,
           'otto' AS flavor,
           CASE doc_id % 3 WHEN 0 THEN 'lz' WHEN 1 THEN 'dict'
                ELSE 'literals' END AS br_mode,
           TRUE AS cff_ok
    FROM documents WHERE doc_id % 79 = 37
    """,
    doc="CFF census (operators/cff.py — the PostScript-outline table "
    "'OTTO'-flavor OpenType fonts carry instead of glyf/loca; a "
    "crawl-side font pipeline meets both families): every 79th "
    "document carries an OTTO WOFF2 whose CFF is assembled by the "
    "vendored writer — header, Name/TopDict/String/GlobalSubr "
    "INDEXes (offset arrays with the smallest legal OffSize, "
    "validated monotone on parse), Top DICT with CharStrings (op "
    "17) and Private (op 18) pointers resolved by fix-point, and "
    "real Type 2 charstrings: per-glyph width operands detected by "
    "the spec's operand-parity rule (a d%4 lane OMITS the width so "
    "the Private DICT's defaultWidthX path runs), hstem lanes, "
    "rmoveto/rlineto outlines whose point counts and width sums are "
    "closed-form under the oracle. The census walks the container "
    "(arbitrary-tag directory entry — 'CFF ' is outside the "
    "transcribed known-tag head), re-verifies the sfnt checksum "
    "layer, parses the CFF, runs every charstring through the "
    "bounded interpreter, and cff_ok folds per-glyph width/position "
    "equality against the model plus maxp.numGlyphs == CharStrings "
    "count. 100 TB shape: per-payload decode in Arrow-batched "
    "mapInPandas, no shuffle.",
)
def m32_cff_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    from tectonic_spark.operators.cff import (
        build_cff,
        build_charstring,
        parse_cff,
    )
    from tectonic_spark.operators.woff2 import (
        encode_woff2,
        parse_woff2,
        reconstruct_sfnt,
        verify_sfnt,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 79 == 37)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_glyphs", LongType(), True),
            StructField("n_points", LongType(), True),
            StructField("n_stems", LongType(), True),
            StructField("sum_width", LongType(), True),
            StructField("flavor", StringType(), True),
            StructField("br_mode", StringType(), True),
            StructField("cff_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ng = 5 + d % 10
                w0 = 100 + d % 50
                wd = 77 + d % 20
                mode = ("lz", "dict", "literals")[d % 3]
                css = []
                want_glyphs = []
                for g in range(ng):
                    ops = []
                    if g % 2 == 0:
                        ops.append(("hstem", [10, 20 + g]))
                    ops.append(("rmoveto", [10 * g + d % 7, 5]))
                    pairs = [(4 + j, 4 - j) for j in range(1 + g % 3)]
                    ops.append(
                        ("rlineto", [c for p in pairs for c in p])
                    )
                    ops.append(("endchar", []))
                    width = None if g % 4 == 3 else w0 + g
                    css.append(build_charstring(ops, width=width))
                    want_glyphs.append(
                        {
                            "width": wd if g % 4 == 3 else w0 + g,
                            "n_points": 2 + g % 3,
                            "n_stems": 1 if g % 2 == 0 else 0,
                            "x": 10 * g + d % 7
                            + sum(p[0] for p in pairs),
                            "y": 5 + sum(p[1] for p in pairs),
                        }
                    )
                cff = build_cff(
                    "Doc-CFF-%06d" % d, css,
                    private_entries=[(20, [wd]), (21, [0])],
                )
                head = bytearray(54)
                head[12:16] = struct.pack(">I", 0x5F0F3CF5)
                head[18:20] = struct.pack(">H", 1000)
                tables = [
                    (b"head", bytes(head)),
                    (b"maxp", struct.pack(">IH", 0x00005000, ng)),
                    (b"CFF ", cff),
                    (b"cmap", bytes(20)),
                ]
                payload = encode_woff2(
                    tables, flavor=b"OTTO", br_mode=mode
                )
                info = parse_woff2(payload, keep_tables=True)
                got = dict(info["table_bytes"])
                v = verify_sfnt(
                    reconstruct_sfnt(info["table_bytes"], flavor=b"OTTO")
                )
                census = parse_cff(got[b"CFF "])
                per_glyph_ok = all(
                    gl["width"] == w["width"]
                    and gl["n_points"] == w["n_points"]
                    and gl["n_stems"] == w["n_stems"]
                    and gl["x"] == w["x"]
                    and gl["y"] == w["y"]
                    for gl, w in zip(census["glyphs"], want_glyphs)
                )
                ok = (
                    info["flavor"] == "otto"
                    and info["sfnt_size_ok"]
                    and info["stream_ok"]
                    and info["bytes_walked"] == len(payload)
                    and info["num_glyphs"] == census["n_glyphs"]
                    and census["name"] == "Doc-CFF-%06d" % d
                    and v["checksums_ok"]
                    and bool(v["adjustment_ok"])
                    and v["flavor"] == "otto"
                    and per_glyph_ok
                )
                rows.append(
                    (d, census["n_glyphs"], census["n_points"],
                     census["n_stems"], census["sum_width"],
                     info["flavor"], mode, ok)
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_glyphs", "n_points", "n_stems",
                     "sum_width", "flavor", "br_mode", "cff_ok"],
        )

    return docs.mapInPandas(walk, schema)


@register(
    "m33_docx_extract",
    oracle="""
    WITH d AS (SELECT doc_id, n_chars,
        CAST(CEIL((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                  / 8.0) AS BIGINT) AS np
      FROM documents WHERE doc_id % 89 = 47)
    SELECT doc_id,
           np AS n_paragraphs,
           CAST(CASE WHEN np > 2 AND doc_id % 2 = 0 THEN 2 ELSE 1 END
                AS BIGINT) AS n_headings,
           CAST(n_chars AS BIGINT) AS chars,
           'doc ' || CAST(doc_id AS VARCHAR) AS title,
           doc_id % 3 = 0 AS has_table,
           CAST(CASE WHEN doc_id % 3 = 0
                THEN 4 * (9 + LENGTH(CAST(doc_id AS VARCHAR)))
                ELSE 0 END AS BIGINT) AS n_table_chars,
           CASE WHEN doc_id % 7 = 0 THEN 'x' ELSE 'w' END AS ns_prefix,
           TRUE AS extract_ok
    FROM d
    """,
    doc="OOXML .docx text extraction (r13, ooxml.py — the office format "
    "crawls meet second only to PDF, and a first-class training-data "
    "source): every 89th document renders as a real .docx package "
    "(OPC ZIP via archive.py, WordprocessingML via xmlparse.py) — "
    "paragraphs as 8-word lines with Heading1/Heading2 pStyle lanes, "
    "multi-run bodies with xml:space-preserving edge whitespace, a "
    "2x2 w:tbl every third doc, Dublin Core docProps — then "
    "extracted back OPC-correctly: the main part resolved through "
    "_rels/.rels (never a hardcoded path), content type verified "
    "against [Content_Types].xml, the body walked by NAMESPACE URI "
    "(the d%7==0 lane binds WordprocessingML to a non-standard "
    "prefix to prove it). chars counts the re-joined extracted "
    "paragraphs, asserted in-task equal to the source text "
    "(extraction drift is a hard error, the m24 pattern); table "
    "cells, heading styles and core metadata are pinned the same "
    "way. 100 TB shape: per-payload build+parse in Arrow-batched "
    "mapInPandas, no shuffle.",
)
def m33_docx_extract(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 89 == 47)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_paragraphs", LongType(), True),
            StructField("n_headings", LongType(), True),
            StructField("chars", LongType(), True),
            StructField("title", StringType(), True),
            StructField("has_table", BooleanType(), True),
            StructField("n_table_chars", LongType(), True),
            StructField("ns_prefix", StringType(), True),
            StructField("extract_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.ooxml import build_docx, extract_docx

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                words = text.split(" ")
                lines = [
                    " ".join(words[i : i + 8])
                    for i in range(0, len(words), 8)
                ]
                paras = []
                for j, ln in enumerate(lines):
                    style = "Normal"
                    if j == 0:
                        style = "Heading1"
                    elif j == 2 and len(lines) > 2 and d % 2 == 0:
                        style = "Heading2"
                    paras.append((style, ln))
                tbl = (
                    [
                        [f"r0c0 doc {d}", f"r0c1 doc {d}"],
                        [f"r1c0 doc {d}", f"r1c1 doc {d}"],
                    ]
                    if d % 3 == 0
                    else None
                )
                prefix = "x" if d % 7 == 0 else "w"
                payload = build_docx(
                    paras,
                    title=f"doc {d}",
                    creator=f"crawler {d % 7}",
                    table_rows=tbl,
                    w_prefix=prefix,
                )
                out = extract_docx(payload)
                rejoined = " ".join(t for _, t in out["paragraphs"])
                if rejoined != text:
                    raise ValueError(f"doc {d}: docx extraction drift")
                if tbl is not None and out["tables"] != [tbl]:
                    raise ValueError(f"doc {d}: docx table drift")
                ok = (
                    out["title"] == f"doc {d}"
                    and out["creator"] == f"crawler {d % 7}"
                    and [s for s, _ in out["paragraphs"]]
                    == [s for s, _ in paras]
                )
                rows.append(
                    (
                        d,
                        len(out["paragraphs"]),
                        sum(
                            1
                            for s, _ in out["paragraphs"]
                            if s.startswith("Heading")
                        ),
                        len(rejoined),
                        out["title"],
                        bool(out["tables"]),
                        sum(
                            len(c)
                            for t in out["tables"]
                            for r in t
                            for c in r
                        ),
                        prefix,
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_paragraphs",
                    "n_headings",
                    "chars",
                    "title",
                    "has_table",
                    "n_table_chars",
                    "ns_prefix",
                    "extract_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m34_epub_extract",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 3 AS BIGINT) AS n_chapters,
           CAST(n_chars AS BIGINT) AS chars,
           'book ' || CAST(doc_id AS VARCHAR) AS book_title,
           lang,
           'c' || CAST(doc_id % (1 + doc_id % 3) AS VARCHAR)
             AS spine_first,
           TRUE AS extract_ok
    FROM documents WHERE doc_id % 97 = 53
    """,
    doc="EPUB e-book extraction (r13, epub.py — long-document "
    "training data: books arrive as OCF/OPF packages): every 97th "
    "document becomes a real .epub — stored-first mimetype member "
    "(the OCF rule), container.xml -> OPF -> spine resolution, "
    "1-3 XHTML chapters whose FILE order is rotated against reading "
    "order (spine_first pins that extraction followed the spine, "
    "not the directory), dc:language carrying the row's lang column "
    "- and extracted back: chapter prose re-joined across the spine "
    "is asserted in-task equal to the source text; chapter titles, "
    "book metadata and manifest size are pinned. 100 TB shape: "
    "per-payload build+parse in Arrow-batched mapInPandas, no "
    "shuffle.",
)
def m34_epub_extract(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang")
        .where(F.col("doc_id") % 97 == 53)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_chapters", LongType(), True),
            StructField("chars", LongType(), True),
            StructField("book_title", StringType(), True),
            StructField("lang", StringType(), True),
            StructField("spine_first", StringType(), True),
            StructField("extract_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.epub import build_epub, extract_epub

        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"]
            ):
                d = int(doc_id)
                words = text.split(" ")
                lines = [
                    " ".join(words[i : i + 8])
                    for i in range(0, len(words), 8)
                ]
                nc = 1 + d % 3
                per = (len(lines) + nc - 1) // nc
                groups = [
                    lines[i : i + per] for i in range(0, len(lines), per)
                ]
                while len(groups) < nc:
                    groups.append([])
                chaps = [
                    (f"ch {k} of doc {d}", "\n".join(g))
                    for k, g in enumerate(groups)
                ]
                payload = build_epub(
                    chaps,
                    title=f"book {d}",
                    author="crawler",
                    lang=str(lang),
                    spine_rotate=d % nc,
                )
                out = extract_epub(payload)
                rejoined = " ".join(
                    ln
                    for _, body in out["chapters"]
                    for ln in body.split("\n")
                    if ln
                )
                if rejoined != text:
                    raise ValueError(f"doc {d}: epub extraction drift")
                ok = (
                    out["title"] == f"book {d}"
                    and out["author"] == "crawler"
                    and out["lang"] == str(lang)
                    and [t for t, _ in out["chapters"]]
                    == [t for t, _ in chaps]
                    and out["n_manifest"] == nc
                )
                rows.append(
                    (
                        d,
                        len(out["chapters"]),
                        len(rejoined),
                        out["title"],
                        out["lang"],
                        out["spine_ids"][0],
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_chapters",
                    "chars",
                    "book_title",
                    "lang",
                    "spine_first",
                    "extract_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m35_rtf_extract",
    oracle="""
    WITH d AS (SELECT doc_id, n_chars,
        CAST(CEIL((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                  / 8.0) AS BIGINT) AS np
      FROM documents WHERE doc_id % 101 = 59)
    SELECT doc_id,
           np AS n_paragraphs,
           CAST(n_chars + CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END
                AS BIGINT) AS chars,
           'doc ' || CAST(doc_id AS VARCHAR) || ' rtf' AS title,
           CASE WHEN doc_id % 2 = 0 THEN 'latin' ELSE 'cjk' END
             AS uni_lane,
           CAST(doc_id % 4 AS BIGINT) AS bold_every,
           TRUE AS extract_ok
    FROM d
    """,
    doc="RTF text extraction (r13, rtf.py — the legacy office format "
    "still abundant in older crawls and mail archives): every 101st "
    "document renders through the RTF writer — 8-word-line "
    "paragraphs separated by \\\\par, a {\\\\b} formatting group "
    "every (d%4)-th word, \\\\info title metadata, and a non-ASCII "
    "suffix lane (even docs append latin-1 chars that ride \\\\'xx "
    "cp1252 escapes + \\\\uN, odd docs a CJK char that rides the "
    "signed-16 \\\\uN rule) — then tokenized back: group-scoped "
    "\\\\uc fallback skipping, destination skipping (fonttbl/"
    "colortbl/{\\\\*\\\\generator}), cp1252 hex decode. Extracted "
    "text is asserted in-task equal to the paragraphs (drift = "
    "hard error); chars is the closed-form n_chars plus the "
    "suffix-lane width. 100 TB shape: per-payload build+parse in "
    "Arrow-batched mapInPandas, no shuffle.",
)
def m35_rtf_extract(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 101 == 59)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_paragraphs", LongType(), True),
            StructField("chars", LongType(), True),
            StructField("title", StringType(), True),
            StructField("uni_lane", StringType(), True),
            StructField("bold_every", LongType(), True),
            StructField("extract_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.rtf import build_rtf, extract_rtf

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                words = text.split(" ")
                paras = [
                    " ".join(words[i : i + 8])
                    for i in range(0, len(words), 8)
                ]
                suffix = " é€" if d % 2 == 0 else " 中"
                paras[-1] += suffix
                payload = build_rtf(
                    paras, title=f"doc {d} rtf", bold_every=d % 4
                )
                out = extract_rtf(payload)
                want = "\n".join(paras)
                if out["text"] != want:
                    raise ValueError(f"doc {d}: rtf extraction drift")
                rows.append(
                    (
                        d,
                        len(paras),
                        len(want),
                        out["title"],
                        "latin" if d % 2 == 0 else "cjk",
                        d % 4,
                        out["title"] == f"doc {d} rtf",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_paragraphs",
                    "chars",
                    "title",
                    "uni_lane",
                    "bold_every",
                    "extract_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m36_ico_census",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 3 AS BIGINT) AS n_images,
           CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 48
                ELSE 112 END AS BIGINT) AS sum_width,
           CAST(CASE WHEN doc_id % 3 = 0
                     THEN CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                     WHEN doc_id % 3 = 1 THEN 1
                     ELSE CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END
                END AS BIGINT) AS n_png,
           CAST((1 + doc_id % 3)
                - CASE WHEN doc_id % 3 = 0
                       THEN CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                       WHEN doc_id % 3 = 1 THEN 1
                       ELSE CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END
                  END AS BIGINT) AS n_bmp,
           TRUE AS census_ok
    FROM documents WHERE doc_id % 103 = 61
    """,
    doc="ICO favicon census (r13, codecs.py encode_ico/parse_ico — "
    "one favicon.ico per crawled host, the most-fetched image on "
    "the web): every 103rd document's host serves an icon with "
    "1-3 images (16/32/64 px), each payload either a headerless "
    "BMP DIB (24-bit XOR block + 1-bpp AND mask under the "
    "doubled-biHeight rule) or a whole PNG stream (the Vista+ "
    "form), alternating by (d+k)%2. The census re-decodes every "
    "payload (PNG through the engine's own png.py decoder), "
    "verifies directory dims against the payload's own header, "
    "requires payloads to tile the file contiguously with zero "
    "trailing bytes, and census_ok folds pixel-exact comparison "
    "of every decoded image against the generator. 100 TB shape: "
    "per-payload walk in Arrow-batched mapInPandas, no shuffle.",
)
def m36_ico_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 103 == 61)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_images", LongType(), True),
            StructField("sum_width", LongType(), True),
            StructField("n_png", LongType(), True),
            StructField("n_bmp", LongType(), True),
            StructField("census_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.codecs import encode_ico, parse_ico

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 1 + d % 3
                imgs = []
                for k in range(n):
                    s = 16 << k
                    imgs.append(
                        {
                            "w": s,
                            "h": s,
                            "fmt": "png" if (d + k) % 2 == 0 else "bmp",
                            "pixels": bytes(
                                (i * (d % 251 + k + 1) + d) % 256
                                for i in range(s * s * 3)
                            ),
                        }
                    )
                back = parse_ico(encode_ico(imgs))
                ok = len(back) == n and all(
                    (a["w"], a["h"], a["fmt"], a["pixels"])
                    == (b["w"], b["h"], b["fmt"], b["pixels"])
                    for a, b in zip(imgs, back)
                )
                rows.append(
                    (
                        d,
                        len(back),
                        sum(b["w"] for b in back),
                        sum(1 for b in back if b["fmt"] == "png"),
                        sum(1 for b in back if b["fmt"] == "bmp"),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_images",
                    "sum_width",
                    "n_png",
                    "n_bmp",
                    "census_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m37_xlsx_extract",
    oracle="""
    WITH d AS (SELECT doc_id,
        CAST(2 + doc_id % 5 AS BIGINT) AS R
      FROM documents WHERE doc_id % 109 = 67)
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_sheets,
           R + 2 * (doc_id % 2) AS n_rows,
           R AS n_string_cells,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE R END AS BIGINT)
             AS n_shared_unique,
           CAST(R * (doc_id % 100) + 3 * R * (R - 1) / 2
                + R * (R + 1) / 2
                + (doc_id % 2) * (2 * (doc_id % 50) + 1) AS BIGINT)
             AS sum_numeric,
           doc_id % 3 = 0 AS inline,
           TRUE AS extract_ok
    FROM d
    """,
    doc="SpreadsheetML .xlsx extraction (r13, ooxml.py XLSX layer — "
    "tabular training data: spreadsheets are the third big OOXML "
    "surface after text and PDF): every 109th document carries a "
    "workbook with a (2 + d%5)-row x 3-col data sheet (numeric / "
    "shared-string / numeric columns) and, every second doc, a "
    "second sheet — resolved OPC-correctly: workbook part through "
    "the package rels, worksheets through the workbook's OWN "
    "relationship part by r:id (never by filename), strings "
    "through the shared-strings table with uniqueCount verified, "
    "every cell's A1 reference cross-checked against its actual "
    "position, shared indices bounds-checked. The d%3==0 lane "
    "writes inline strings (t=inlineStr) instead — same extracted "
    "values, zero shared entries, proving both string paths. "
    "extract_ok folds cell-exact comparison of every sheet against "
    "the generator; sums/counts are closed-form. 100 TB shape: "
    "per-payload build+parse in Arrow-batched mapInPandas, no "
    "shuffle.",
)
def m37_xlsx_extract(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 109 == 67)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_sheets", LongType(), True),
            StructField("n_rows", LongType(), True),
            StructField("n_string_cells", LongType(), True),
            StructField("n_shared_unique", LongType(), True),
            StructField("sum_numeric", LongType(), True),
            StructField("inline", BooleanType(), True),
            StructField("extract_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.ooxml import build_xlsx, extract_xlsx

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                r_n = 2 + d % 5
                data_rows = [
                    [d % 100 + 3 * r, f"w{(d + r) % 7}", r + 1]
                    for r in range(r_n)
                ]
                sheets = [("data", data_rows)]
                if d % 2 == 1:
                    sheets.append(
                        ("extra", [[d % 50 + r] for r in range(2)])
                    )
                inline = d % 3 == 0
                payload = build_xlsx(sheets, inline_lane=inline)
                out = extract_xlsx(payload)
                if out["sheets"] != sheets:
                    raise ValueError(f"doc {d}: xlsx extraction drift")
                total_rows = sum(len(rws) for _, rws in out["sheets"])
                sum_numeric = sum(
                    v
                    for _, rws in out["sheets"]
                    for row in rws
                    for v in row
                    if not isinstance(v, str)
                )
                rows.append(
                    (
                        d,
                        len(out["sheets"]),
                        total_rows,
                        out["n_string_cells"],
                        out["n_shared_unique"],
                        int(sum_numeric),
                        out["inline"],
                        out["inline"] == inline,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_sheets",
                    "n_rows",
                    "n_string_cells",
                    "n_shared_unique",
                    "sum_numeric",
                    "inline",
                    "extract_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m38_odt_extract",
    oracle="""
    WITH d AS (SELECT doc_id, n_chars,
        CAST(CEIL((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                  / 8.0) AS BIGINT) AS np
      FROM documents WHERE doc_id % 127 = 73)
    SELECT doc_id,
           np AS n_paragraphs,
           CAST(CASE WHEN np > 2 AND doc_id % 2 = 0 THEN 2 ELSE 1 END
                AS BIGINT) AS n_headings,
           CAST(n_chars + 5 AS BIGINT) AS chars,
           'odt ' || CAST(doc_id AS VARCHAR) AS title,
           TRUE AS extract_ok
    FROM d
    """,
    doc="OpenDocument .odt extraction (r13, odf.py — the "
    "LibreOffice-default ODF format completing the office trio next "
    "to OOXML and RTF; government/academic corpora are full of it): "
    "every 127th document renders as a real .odt — mimetype-first "
    "STORED member (ODF 1.2 Part 3's sniffing rule, verified), "
    "META-INF manifest cross-checked against the actual parts, "
    "content.xml with text:h outline-level headings and text:p "
    "paragraphs in two text:span runs — and the ODF WHITESPACE "
    "RULE for real: the last paragraph gets a double-space suffix "
    "that must round-trip through <text:s text:c>, which only an "
    "extractor with an ORDER-PRESERVING mixed-content view can "
    "expand correctly (xmlparse grew Element.content for exactly "
    "this). chars = n_chars + the 5-char suffix, closed-form; "
    "extraction drift is an in-task hard error. 100 TB shape: "
    "per-payload build+parse in Arrow-batched mapInPandas, no "
    "shuffle.",
)
def m38_odt_extract(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 127 == 73)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_paragraphs", LongType(), True),
            StructField("n_headings", LongType(), True),
            StructField("chars", LongType(), True),
            StructField("title", StringType(), True),
            StructField("extract_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.odf import build_odt, extract_odt

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                words = text.split(" ")
                lines = [
                    " ".join(words[i : i + 8])
                    for i in range(0, len(words), 8)
                ]
                paras = []
                for j, ln in enumerate(lines):
                    level = 0
                    if j == 0:
                        level = 1
                    elif j == 2 and len(lines) > 2 and d % 2 == 0:
                        level = 2
                    paras.append((level, ln))
                # the whitespace-rule lane: "  ab " is 5 chars with a
                # double-space AND a trailing space — both must ride
                # text:s elements to survive
                lvl, last = paras[-1]
                paras[-1] = (lvl, last + "  ab ")
                payload = build_odt(paras, title=f"odt {d}")
                out = extract_odt(payload)
                if out["paragraphs"] != paras:
                    raise ValueError(f"doc {d}: odt extraction drift")
                rows.append(
                    (
                        d,
                        len(out["paragraphs"]),
                        sum(1 for lv, _ in out["paragraphs"] if lv > 0),
                        sum(len(t) for _, t in out["paragraphs"])
                        + (len(paras) - 1),
                        out["title"],
                        out["title"] == f"odt {d}",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_paragraphs",
                    "n_headings",
                    "chars",
                    "title",
                    "extract_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m39_svg_census",
    oracle="""
    SELECT doc_id,
           CAST(16 + (doc_id % 4) * 16 AS BIGINT) AS width,
           CAST(1 + doc_id % 3 AS BIGINT) AS n_rects,
           CAST(doc_id % 2 AS BIGINT) AS n_circles,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT)
             AS n_paths,
           CAST(doc_id % 4 + 4
                + CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 0 END AS BIGINT)
             AS path_commands,
           CAST(doc_id % 4 + 1 AS BIGINT) AS n_implicit,
           TRUE AS census_ok
    FROM documents WHERE doc_id % 131 = 79
    """,
    doc="SVG census (r13, svg.py — the web's vector format: icons and "
    "logos on every modern page; the substance is the SVG path-data "
    "micro-grammar): every 131st document's host serves an icon with "
    "1-3 rects, an optional circle and one or two paths whose d "
    "attributes exercise the grammar for real — implicit command "
    "repetition (the spec's M-then-implicit-L rule), relative h/v/z "
    "one-axis commands on the second-path lane, tight number "
    "tokenization. The census walks the element tree (including the "
    "d%2 grouped lane), parses every path with exact current-point "
    "tracking, verifies viewBox against width/height, and "
    "census_ok folds the endpoint of the closed main path returning "
    "to its subpath start. 100 TB shape: per-payload build+parse in "
    "Arrow-batched mapInPandas, no shuffle.",
)
def m39_svg_census(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 131 == 79)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("width", LongType(), True),
            StructField("n_rects", LongType(), True),
            StructField("n_circles", LongType(), True),
            StructField("n_paths", LongType(), True),
            StructField("path_commands", LongType(), True),
            StructField("n_implicit", LongType(), True),
            StructField("census_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.svg import build_svg, census_svg

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                side = 16 + (d % 4) * 16
                k = 2 + d % 4  # line segments in the main path
                coords = " ".join(
                    f"{(d + i) % side} {(d * 3 + i * 7) % side}"
                    for i in range(k)
                )
                paths = [f"M0 0 L{coords} Z"]
                if d % 3 == 0:
                    paths.append(f"m1 1h{1 + d % 5}v{1 + d % 7}z")
                payload = build_svg(
                    width=side,
                    height=side,
                    rects=[
                        (i, i, 2 + i, 2 + i) for i in range(1 + d % 3)
                    ],
                    circles=(
                        [(side // 2, side // 2, 3)] if d % 2 else []
                    ),
                    paths=paths,
                    grouped=(d % 2 == 0),
                )
                out = census_svg(payload)
                ok = (
                    out["width"] == side
                    and out["height"] == side
                    and out["endpoints"][0] == (0, 0)
                    and out["path_subpaths"] == len(paths)
                    and out["counts"]["g"] == (1 if d % 2 == 0 else 0)
                )
                rows.append(
                    (
                        d,
                        out["width"],
                        out["counts"]["rect"],
                        out["counts"]["circle"],
                        out["counts"]["path"],
                        out["path_commands"],
                        out["path_implicit"],
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "n_rects",
                    "n_circles",
                    "n_paths",
                    "path_commands",
                    "n_implicit",
                    "census_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)


@register(
    "m40_ods_extract",
    oracle="""
    WITH d AS (SELECT doc_id, CAST(2 + doc_id % 5 AS BIGINT) AS R
      FROM documents WHERE doc_id % 149 = 91)
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS n_sheets,
           R + doc_id % 2 AS n_rows,
           4 * R + 2 * (doc_id % 2) AS n_cells,
           3 * R + 2 * (doc_id % 2) AS n_repeated,
           CAST(3 * (R * (doc_id % 7) + R * (R - 1) / 2)
                + 100 * R + R * (R - 1) / 2 AS BIGINT) AS sum_numeric,
           TRUE AS extract_ok
    FROM d
    """,
    doc="OpenDocument Spreadsheet .ods extraction (r13, odf.py ODS "
    "layer — completing the spreadsheet pair the way odt completed "
    "the document pair): every 149th document carries a workbook "
    "whose rows exercise the ODF storage quirk that matters at "
    "parse time — table:number-columns-repeated compresses each "
    "row's run of three identical numeric cells (LibreOffice emits "
    "this for ANY repetition), and every second doc adds a string "
    "sheet with a repeated text cell. The extractor expands runs "
    "exactly ONCE each (n_repeated audits that the expansion "
    "actually ran), recovers typed values (int-vs-float identity "
    "guards the run comparison: 5 and 5.0 never merge), and "
    "extract_ok folds cell-exact comparison against the generator. "
    "Counts and the numeric sum are closed-form. 100 TB shape: "
    "per-payload build+parse in Arrow-batched mapInPandas, no "
    "shuffle.",
)
def m40_ods_extract(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import BooleanType

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 149 == 91)
    )
    docs = spread_small_scan(docs, spark, "doc_id")
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_sheets", LongType(), True),
            StructField("n_rows", LongType(), True),
            StructField("n_cells", LongType(), True),
            StructField("n_repeated", LongType(), True),
            StructField("sum_numeric", LongType(), True),
            StructField("extract_ok", BooleanType(), True),
        ]
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tectonic_spark.operators.odf import build_ods, extract_ods

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                r_n = 2 + d % 5
                data_rows = [
                    [d % 7 + r] * 3 + [100 + r] for r in range(r_n)
                ]
                sheets = [("data", data_rows)]
                if d % 2 == 1:
                    sheets.append(("tags", [["t", "t"]]))
                payload = build_ods(sheets)
                out = extract_ods(payload)
                if out["sheets"] != sheets:
                    raise ValueError(f"doc {d}: ods extraction drift")
                total_rows = sum(len(rws) for _, rws in out["sheets"])
                total_cells = sum(
                    len(row) for _, rws in out["sheets"] for row in rws
                )
                sum_numeric = sum(
                    v
                    for _, rws in out["sheets"]
                    for row in rws
                    for v in row
                    if not isinstance(v, str)
                )
                rows.append(
                    (
                        d,
                        len(out["sheets"]),
                        total_rows,
                        total_cells,
                        out["n_repeated_cells"],
                        int(sum_numeric),
                        out["n_repeated_cells"]
                        == 3 * r_n + 2 * (d % 2),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_sheets",
                    "n_rows",
                    "n_cells",
                    "n_repeated",
                    "sum_numeric",
                    "extract_ok",
                ],
            )

    return docs.mapInPandas(walk, schema)

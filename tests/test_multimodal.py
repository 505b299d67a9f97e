"""Multimodal column plumbing tests: binary payload synthesis, metadata
decode (stubbed deterministically), frame sampling fan-out, and the
NotImplementedError gate on the real-codec path."""

from __future__ import annotations

import pytest

from tectonic_spark.operators.multimodal import (
    _fake_payload,
    attach_fake_payloads,
    extract_media_meta,
    sample_frames,
)
from tectonic_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_df(spark):
    docs = table(spark, SF, "documents").select("doc_id", "n_chars").limit(60)
    return attach_fake_payloads(docs).cache()


class TestMultimodal:
    def test_payload_is_binary_and_deterministic(self, media_df):
        rows = {r.doc_id: r for r in media_df.collect()}
        assert isinstance(rows[1].media, bytearray | bytes)
        kind = rows[1].media_kind
        assert bytes(rows[1].media) == _fake_payload(1, rows[1].n_chars, kind)

    def test_metadata_schema_and_values(self, media_df):
        meta = extract_media_meta(media_df)
        assert meta.schema.simpleString() == (
            "struct<doc_id:bigint,media_kind:string,width:bigint,"
            "height:bigint,n_frames:bigint,payload_bytes:bigint>"
        )
        r = {x.doc_id: x for x in meta.collect()}[5]
        assert r.width == 64 + (5 % 16) * 32
        assert r.height == 64 + (5 % 9) * 32

    def test_images_have_one_frame(self, media_df):
        meta = extract_media_meta(media_df)
        img = meta.filter("media_kind = 'image'").collect()
        assert img and all(r.n_frames == 1 for r in img)

    def test_frame_sampling_counts(self, media_df):
        frames = sample_frames(media_df, every_nth=30)
        got = {
            (r.doc_id, r.frame_idx) for r in frames.collect()
        }
        videos = {
            r.doc_id: r.n_frames
        for r in extract_media_meta(media_df).filter("media_kind='video'").collect()}
        want = {
            (d, i) for d, nf in videos.items() for i in range(0, nf, 30)
        }
        assert got == want

    def test_real_decode_path_is_stubbed(self, media_df):
        with pytest.raises(Exception, match="NotImplementedError|codecs"):
            extract_media_meta(media_df, fake=False).collect()


def test_scene_detection_boundaries_every_scene_len(spark, sf_dir):
    """Decoded scene boundaries land exactly at multiples of SCENE_LEN
    (and nowhere else), and within-scene mad is exactly 0 — the decode
    path reproduces the constructed dynamics bit-for-bit."""
    from pyspark.sql import functions as F

    from tectonic_spark.operators.multimodal import (
        SCENE_LEN,
        m06_scene_detection,
    )

    out = m06_scene_detection(spark, sf_dir)
    bad_boundary = out.where(
        F.col("is_scene_start") != (F.col("frame_idx") % SCENE_LEN == 0)
    ).count()
    assert bad_boundary == 0
    nonzero_within = out.where(
        (~F.col("is_scene_start")) & (F.col("mad") != 0.0)
    ).count()
    assert nonzero_within == 0


def test_decode_image_real_routes_png():
    """m01's real-decode dispatch recognizes PNG payloads (r9)."""
    import numpy as np

    from tectonic_spark.operators.multimodal import _decode_image_real
    from tectonic_spark.operators.png import encode_png

    img = np.arange(15 * 9, dtype=np.uint8).reshape(15, 9) % 256
    kind, w, h, nf = _decode_image_real(encode_png(img, filters=4))
    assert (kind, w, h, nf) == ("image", 9, 15, 1)


def test_decode_image_real_routes_gif_and_tiff():
    """m01's real-decode dispatch recognizes GIF and TIFF payloads (r9)."""
    import numpy as np

    from tectonic_spark.operators.gif import encode_gif
    from tectonic_spark.operators.multimodal import _decode_image_real
    from tectonic_spark.operators.tiff import encode_tiff

    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (np.arange(7 * 9, dtype=np.uint8) % 16).reshape(7, 9)
    kind, w, h, nf = _decode_image_real(encode_gif([idx, idx], pal))
    assert (kind, w, h, nf) == ("image", 9, 7, 2)
    img = (np.arange(11 * 5, dtype=np.uint8) % 256).reshape(11, 5)
    kind, w, h, nf = _decode_image_real(encode_tiff(img, compression=5))
    assert (kind, w, h, nf) == ("image", 5, 11, 1)


def test_decode_image_real_routes_webp():
    """m01's real-decode dispatch recognizes WebP payloads (r10) —
    lossless decodes to pixels; the RIFF branch must not swallow them
    as WAV."""
    import numpy as np

    from tectonic_spark.operators.multimodal import _decode_image_real
    from tectonic_spark.operators.webp import encode_webp

    img = (np.arange(10 * 14 * 4, dtype=np.uint8) % 256).reshape(10, 14, 4)
    kind, w, h, nf = _decode_image_real(encode_webp(img, subtract_green=True))
    assert (kind, w, h, nf) == ("image", 14, 10, 1)

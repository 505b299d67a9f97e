"""Pure-Python media codecs (BMP / WAV / Y4M): golden-file byte equality,
structural header checks against each format's public spec, round-trips,
and the real-decode multimodal paths end-to-end on Spark."""

from __future__ import annotations

import struct
from pathlib import Path

import pytest

from tectonic_spark.operators import codecs

FIX = Path(__file__).parent / "fixtures"


def _golden_bmp_pixels() -> bytes:
    return bytes((7 + i) % 256 for i in range(12 * 5 * 3))


class TestBmp:
    def test_golden_bytes_stable(self):
        assert codecs.encode_bmp(12, 5, _golden_bmp_pixels()) == (
            FIX / "golden.bmp"
        ).read_bytes()

    def test_header_fields_per_spec(self):
        data = (FIX / "golden.bmp").read_bytes()
        assert data[:2] == b"BM"
        (file_size,) = struct.unpack_from("<I", data, 2)
        assert file_size == len(data)
        (offset,) = struct.unpack_from("<I", data, 10)
        assert offset == 54
        hdr, w, h = struct.unpack_from("<Iii", data, 14)
        assert (hdr, w, h) == (40, 12, 5)
        planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
        assert (planes, bpp, comp) == (1, 24, 0)
        # 12*3 = 36 bytes/row, already 4-aligned → 54 + 36*5
        assert len(data) == 54 + codecs.bmp_row_bytes(12) * 5

    def test_roundtrip(self):
        w, h, px = codecs.decode_bmp((FIX / "golden.bmp").read_bytes())
        assert (w, h) == (12, 5)
        assert px == _golden_bmp_pixels()

    def test_row_padding(self):
        # width 3 → 9 bytes/row → padded to 12
        px = bytes(range(3 * 2 * 3))
        data = codecs.encode_bmp(3, 2, px)
        assert len(data) == 54 + 12 * 2
        assert codecs.decode_bmp(data) == (3, 2, px)

    def test_rejects_non_24bit(self):
        data = bytearray((FIX / "golden.bmp").read_bytes())
        struct.pack_into("<H", data, 28, 8)  # bpp = 8
        with pytest.raises(NotImplementedError):
            codecs.decode_bmp(bytes(data))

    def test_nearest_resize(self):
        data = (FIX / "golden.bmp").read_bytes()
        out = codecs.resize_bmp_nearest(data, 6, 5)
        w, h, px = codecs.decode_bmp(out)
        assert (w, h) == (6, 5)
        src = _golden_bmp_pixels()
        # column x samples source column x*12//6 = 2x
        for y in range(5):
            for x in range(6):
                s = (y * 12 + (x * 12 // 6)) * 3
                d = (y * 6 + x) * 3
                assert px[d : d + 3] == src[s : s + 3]


class TestWav:
    def test_golden_bytes_stable(self):
        samples = bytes((3 * i + 1) % 256 for i in range(200))
        assert codecs.encode_wav(samples, 8000) == (FIX / "golden.wav").read_bytes()

    def test_header_fields_per_spec(self):
        data = (FIX / "golden.wav").read_bytes()
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        (riff_len,) = struct.unpack_from("<I", data, 4)
        assert riff_len == len(data) - 8
        assert data[12:16] == b"fmt "
        fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", data, 20)
        assert (fmt, ch, rate, bits) == (1, 1, 8000, 8)
        assert data[36:40] == b"data"
        (dlen,) = struct.unpack_from("<I", data, 40)
        assert dlen == 200 and len(data) == 44 + 200

    def test_roundtrip(self):
        rate, samples = codecs.decode_wav((FIX / "golden.wav").read_bytes())
        assert rate == 8000
        assert samples == bytes((3 * i + 1) % 256 for i in range(200))

    def test_chunk_walk_skips_unknown_chunks(self):
        # LIST chunk between fmt and data must be skipped, not choke
        data = (FIX / "golden.wav").read_bytes()
        injected = data[:36] + b"LIST" + struct.pack("<I", 4) + b"INFO" + data[36:]
        rate, samples = codecs.decode_wav(injected)
        assert rate == 8000 and len(samples) == 200

    def test_rejects_16bit(self):
        data = bytearray((FIX / "golden.wav").read_bytes())
        struct.pack_into("<H", data, 34, 16)  # bits = 16
        with pytest.raises(NotImplementedError):
            codecs.decode_wav(bytes(data))


class TestY4m:
    def test_golden_bytes_stable(self):
        fb = codecs.frame_bytes_420(12, 8)
        frames = [bytes((f + j) % 256 for j in range(fb)) for f in range(3)]
        assert codecs.encode_y4m(12, 8, frames) == (FIX / "golden.y4m").read_bytes()

    def test_header_is_spec_text(self):
        data = (FIX / "golden.y4m").read_bytes()
        assert data.startswith(b"YUV4MPEG2 W12 H8 F25:1 Ip A1:1\n")
        assert data[31:37] == b"FRAME\n"

    def test_roundtrip(self):
        w, h, frames = codecs.decode_y4m((FIX / "golden.y4m").read_bytes())
        assert (w, h, len(frames)) == (12, 8, 3)
        fb = codecs.frame_bytes_420(12, 8)
        assert frames[2] == bytes((2 + j) % 256 for j in range(fb))

    def test_frame_size_is_420(self):
        assert codecs.frame_bytes_420(12, 8) == 12 * 8 * 3 // 2

    def test_odd_dims_rejected(self):
        with pytest.raises(ValueError):
            codecs.encode_y4m(11, 8, [])


class TestRealDecodeOnSpark:
    def test_m01_real_decode_all_kinds(self, spark, sf_dir):
        from tectonic_spark.operators.multimodal import (
            attach_real_payloads,
            extract_media_meta,
        )
        from tectonic_spark.tables import table

        docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars").limit(30)
        meta = extract_media_meta(attach_real_payloads(docs), fake=False).collect()
        kinds = {r.media_kind for r in meta}
        assert kinds == {"image", "audio", "video"}
        for r in meta:
            if r.media_kind == "image":
                assert r.n_frames == 1 and r.width >= 8
            elif r.media_kind == "audio":
                assert r.width is None and r.n_frames >= 0
            else:
                assert r.width in (8, 12, 16) and r.n_frames >= 1

    def test_resized_output_is_valid_bmp(self, spark, sf_dir):
        from tectonic_spark.operators.multimodal import (
            attach_real_payloads,
            resize_images_real,
        )
        from tectonic_spark.tables import table

        docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars").limit(9)
        rows = resize_images_real(attach_real_payloads(docs), max_side=32).collect()
        assert rows
        for r in rows:
            w, h, px = codecs.decode_bmp(bytes(r.media))
            assert (w, h) == (r.width, r.height)
            assert max(w, h) <= 32
            assert len(px) == w * h * 3

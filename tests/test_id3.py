"""ID3v2.3/v2.4 + ID3v1 tests: frame grammar across versions and text
encodings, unsynchronization, APIC with a real PNG payload, the
parse_mp3 tag-boundary agreement, and the error taxonomy."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.codecs import encode_mp3_frames, parse_mp3
from tectonic_spark.operators.id3 import (
    build_apic_frame,
    build_id3v1,
    build_id3v2,
    build_text_frame,
    parse_id3v1,
    parse_id3v2,
)
from tectonic_spark.operators.png import decode_png, encode_png


def _tag(ver=4, unsync=False, enc=3, title="Song"):
    return build_id3v2(
        [
            build_text_frame("TIT2", title, enc),
            build_text_frame("TPE1", "Artist", enc),
        ],
        version=ver,
        unsync=unsync,
    )


class TestV2:
    @pytest.mark.parametrize("ver", [3, 4])
    @pytest.mark.parametrize("enc", [0, 1, 2, 3])
    @pytest.mark.parametrize("unsync", [False, True])
    def test_matrix_roundtrip(self, ver, enc, unsync):
        tag = _tag(ver, unsync, enc, title="Ti & tle")
        r = parse_id3v2(tag + b"\xff\xfbAUDIO")
        assert r["version"] == ver
        assert r["tag_size"] == len(tag)
        assert r["text"]["TIT2"] == "Ti & tle"
        assert r["text"]["TPE1"] == "Artist"

    def test_non_latin_text(self):
        for enc in (1, 2, 3):
            tag = _tag(enc=enc, title="Ünïcødé — 歌")
            assert parse_id3v2(tag)["text"]["TIT2"] == "Ünïcødé — 歌"

    def test_latin1_cannot_carry_unicode(self):
        with pytest.raises(UnicodeEncodeError):
            build_text_frame("TIT2", "歌", 0)

    def test_unsync_reverses_ff_bytes(self):
        img = b"\xff\xe0\xff\xff\x00\xff"
        tag = build_id3v2([build_apic_frame(img, "image/x")], unsync=True)
        assert parse_id3v2(tag)["pictures"][0]["image"] == img
        # the stored body must not contain a raw FF followed by >= E0
        body = tag[10:]
        assert not any(
            body[i] == 0xFF and body[i + 1] & 0xE0 == 0xE0
            for i in range(len(body) - 1)
        )

    def test_apic_png_roundtrip(self):
        art = np.arange(64, dtype=np.uint8).reshape(8, 8)
        tag = build_id3v2(
            [build_apic_frame(encode_png(art), "image/png", pic_type=3, desc="d")]
        )
        pic = parse_id3v2(tag)["pictures"][0]
        assert pic["mime"] == "image/png"
        assert pic["pic_type"] == 3
        assert (decode_png(pic["image"]) == art).all()

    def test_padding_tolerated(self):
        tag = bytearray(_tag())
        # grow declared size and append zero padding
        body_len = len(tag) - 10
        pad = 64
        from tectonic_spark.operators.id3 import _syncsafe

        tag[6:10] = _syncsafe(body_len + pad)
        tag += b"\x00" * pad
        r = parse_id3v2(bytes(tag))
        assert r["text"]["TIT2"] == "Song"
        assert r["tag_size"] == 10 + body_len + pad

    def test_mp3_walker_agrees_on_boundary(self):
        tag = _tag(unsync=True)
        audio = encode_mp3_frames(5, bitrate_idx=9)
        v1 = build_id3v1(title="t", track=3)
        payload = tag + audio + v1
        assert parse_mp3(payload)["n_frames"] == 5
        assert parse_id3v2(payload)["tag_size"] == len(tag)

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["TIT2", "TALB", "TXXX", "TCON"]),
                st.text(max_size=40).filter(lambda s: "\x00" not in s),
                st.integers(1, 3),
            ),
            min_size=1,
            max_size=5,
        ),
        st.sampled_from([3, 4]),
        st.booleans(),
    )
    def test_roundtrip_property(self, fields, ver, unsync):
        frames = [build_text_frame(f, t, e) for f, t, e in fields]
        r = parse_id3v2(build_id3v2(frames, version=ver, unsync=unsync))
        # last occurrence of a repeated frame id wins in the text dict
        want = {f: t for f, t, _ in fields}
        assert r["text"] == want


class TestErrors:
    def test_no_tag(self):
        with pytest.raises(ValueError, match="no ID3v2"):
            parse_id3v2(b"\xff\xfbXXXX")

    def test_truncated_header(self):
        with pytest.raises(EOFError):
            parse_id3v2(b"ID3\x04\x00\x00\x00")

    def test_truncated_body(self):
        tag = _tag()
        with pytest.raises(EOFError, match="body"):
            parse_id3v2(tag[:-3])

    def test_frame_overrun(self):
        from tectonic_spark.operators.id3 import _syncsafe

        body = b"TIT2" + _syncsafe(100) + b"\x00\x00" + b"\x03hi\x00"
        tag = b"ID3\x04\x00\x00" + _syncsafe(len(body)) + body
        with pytest.raises(EOFError, match="overruns"):
            parse_id3v2(tag)

    def test_future_version(self):
        with pytest.raises(NotImplementedError):
            parse_id3v2(b"ID3\x07\x00\x00\x00\x00\x00\x00")

    def test_non_syncsafe_size(self):
        with pytest.raises(ValueError, match="syncsafe"):
            parse_id3v2(b"ID3\x04\x00\x00\x80\x00\x00\x00")

    def test_bad_encoding_byte(self):
        body = b"TIT2" + bytes([0, 0, 0, 3]) + b"\x00\x00" + b"\x09hi"
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(body)]) + body
        with pytest.raises(ValueError, match="encoding"):
            parse_id3v2(tag)


class TestV1:
    def test_v11_track(self):
        blk = build_id3v1(
            title="T" * 30, artist="A", album="B", year="2001",
            comment="c" * 28, track=255, genre=79,
        )
        r = parse_id3v1(b"audio" + blk)
        assert (r["title"], r["track"], r["genre"]) == ("T" * 30, 255, 79)
        assert r["comment"] == "c" * 28

    def test_v10_no_track(self):
        blk = build_id3v1(title="T", comment="c" * 30)
        r = parse_id3v1(blk)
        assert r["track"] is None and r["comment"] == "c" * 30

    def test_absent(self):
        assert parse_id3v1(b"\x00" * 200) is None
        assert parse_id3v1(b"short") is None

    def test_field_too_long(self):
        with pytest.raises(ValueError, match="too long"):
            build_id3v1(title="x" * 31)

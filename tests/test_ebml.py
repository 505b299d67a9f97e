"""EBML/Matroska/WebM census tests: vint edges, mux→census round-trip
across block shapes (SimpleBlock / BlockGroup / Xiph lacing), both
doc types, error taxonomy, Hypothesis round-trip sweep."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.ebml import encode_mkv, parse_mkv
from tectonic_spark.operators.ebml import _encode_size, _read_vint


VIDEO = {"number": 1, "type": "video", "codec_id": "V_VP9", "width": 320, "height": 240}
AUDIO = {"number": 2, "type": "audio", "codec_id": "A_OPUS", "sampling": 48000.0, "channels": 2}


def _simple(track, frame, key=False, off=0):
    return {"track": track, "frame": frame, "keyframe": key, "offset": off}


class TestVint:
    def test_size_roundtrip(self):
        for v in (0, 1, 126, 127, 128, 16382, 16383, 2**21 - 3, 2**49 - 2):
            enc = _encode_size(v)
            got, pos = _read_vint(enc, 0, keep_marker=False)
            assert got == v and pos == len(enc)

    def test_all_ones_is_unknown(self):
        got, _ = _read_vint(b"\xff", 0, keep_marker=False)
        assert got == -1

    def test_zero_lead_byte_rejected(self):
        with pytest.raises(ValueError, match="lead byte"):
            _read_vint(b"\x00\x81", 0, keep_marker=False)

    def test_truncated(self):
        with pytest.raises(EOFError):
            _read_vint(b"\x41", 0, keep_marker=False)  # wants 2 bytes


class TestRoundtrip:
    def test_two_track_census(self):
        mkv = encode_mkv(
            [VIDEO, AUDIO],
            [
                {
                    "timestamp": 0,
                    "blocks": [
                        _simple(1, b"vvvv", key=True),
                        _simple(2, b"aa"),
                        _simple(1, b"vvv", off=33),
                    ],
                },
                {
                    "timestamp": 66,
                    "blocks": [_simple(1, b"vv", key=True)],
                },
            ],
            duration_ms=99.0,
        )
        info = parse_mkv(mkv)
        assert info["doc_type"] == "webm"
        assert info["n_clusters"] == 2
        assert info["n_blocks"] == 4
        assert info["n_keyframes"] == 2
        assert info["n_frames"] == 4
        assert info["media_bytes"] == 4 + 2 + 3 + 2
        assert info["duration_ms"] == 99
        assert info["bytes_walked"] == len(mkv)
        v, a = info["tracks"]
        assert (v["codec_id"], v["width"], v["height"]) == ("V_VP9", 320, 240)
        assert (a["codec_id"], a["sampling"], a["channels"]) == ("A_OPUS", 48000.0, 2)

    def test_block_group(self):
        mkv = encode_mkv(
            [AUDIO],
            [
                {
                    "timestamp": 0,
                    "blocks": [
                        {"track": 2, "group_frame": b"opus1", "duration": 20},
                        {"track": 2, "group_frame": b"opus22", "duration": 20},
                    ],
                }
            ],
        )
        info = parse_mkv(mkv)
        assert info["n_block_groups"] == 2
        assert info["n_blocks"] == 2
        assert info["n_keyframes"] == 0  # Block carries no keyframe flag
        assert info["media_bytes"] == 11

    def test_xiph_lacing(self):
        frames = [b"a" * 300, b"bb", b"ccc"]  # first size needs 255-spill
        mkv = encode_mkv(
            [AUDIO],
            [{"timestamp": 0, "blocks": [{"track": 2, "frames": frames}]}],
        )
        info = parse_mkv(mkv)
        assert info["n_blocks"] == 1
        assert info["n_laced_blocks"] == 1
        assert info["n_frames"] == 3
        assert info["media_bytes"] == 305

    def test_matroska_doctype_agrees(self):
        clusters = [{"timestamp": 0, "blocks": [_simple(1, b"xx", key=True)]}]
        webm = parse_mkv(encode_mkv([VIDEO], clusters, doc_type="webm"))
        mkv = parse_mkv(encode_mkv([VIDEO], clusters, doc_type="matroska"))
        for k in ("n_clusters", "n_blocks", "n_keyframes", "n_frames",
                  "media_bytes", "tracks"):
            assert webm[k] == mkv[k]
        assert (webm["doc_type"], mkv["doc_type"]) == ("webm", "matroska")


class TestErrors:
    def test_not_ebml(self):
        with pytest.raises(ValueError, match="EBML"):
            parse_mkv(b"\x00\x00\x00\x20ftypisom")

    def test_truncated_element(self):
        mkv = encode_mkv([VIDEO], [{"timestamp": 0, "blocks": [_simple(1, b"xxxx")]}])
        with pytest.raises(EOFError):
            parse_mkv(mkv[:-3])

    def test_unknown_size_segment_accepted(self):
        # r12: the live-stream shape — Segment (and Clusters) written
        # with the all-ones size census identically to the sized form
        clusters = [
            {"timestamp": 0, "blocks": [_simple(1, b"v0", key=True)]},
            {"timestamp": 50, "blocks": [_simple(1, b"v1v1")]},
        ]
        base = parse_mkv(encode_mkv([VIDEO], clusters, duration_ms=66.0))
        for form in ("segment", "segment+clusters"):
            blob = encode_mkv(
                [VIDEO], clusters, duration_ms=66.0, unknown_size=form
            )
            info = parse_mkv(blob)
            assert info["bytes_walked"] == len(blob)
            for k in (
                "tracks", "n_clusters", "n_blocks", "n_keyframes",
                "n_frames", "media_bytes", "duration_ms", "doc_type",
            ):
                assert info[k] == base[k], (form, k)

    def test_unknown_cluster_resyncs_on_next_cluster(self):
        # cluster boundary = the next Cluster ID, not a stored size
        clusters = [
            {"timestamp": 0, "blocks": [_simple(1, b"aa", key=True)]},
            {"timestamp": 10, "blocks": [_simple(1, b"bbb")]},
            {"timestamp": 20, "blocks": [_simple(1, b"cccc")]},
        ]
        blob = encode_mkv([VIDEO], clusters, unknown_size="segment+clusters")
        info = parse_mkv(blob, keep_frames=True)
        assert info["n_clusters"] == 3
        assert [f for _t, f in info["frames"]] == [b"aa", b"bbb", b"cccc"]

    def test_unknown_size_resync_tolerates_void_and_crc(self):
        # ADVICE r12: real muxers emit Void (0xEC) and CRC-32 (0xBF)
        # padding inside Segment/Cluster — a resync must scan past
        # them, not end the unknown-size element there
        clusters = [
            {"timestamp": 0, "blocks": [_simple(1, b"aa", key=True)]},
            {"timestamp": 10, "blocks": [_simple(1, b"bbb")]},
        ]
        blob = encode_mkv([VIDEO], clusters, unknown_size="segment+clusters")
        void = b"\xec\x84\x00\x00\x00\x00"  # Void, size 4
        crc = b"\xbf\x84\x01\x02\x03\x04"  # CRC-32, size 4
        cluster_id = b"\x1f\x43\xb6\x75"
        second = blob.find(cluster_id, blob.find(cluster_id) + 4)
        assert second > 0
        # Void inside the first unknown-size cluster, CRC-32 between
        # the clusters (a Segment-level global element)
        spliced = blob[:second] + void + crc + blob[second:]
        info = parse_mkv(spliced, keep_frames=True)
        assert info["bytes_walked"] == len(spliced)
        assert info["n_clusters"] == 2
        assert [f for _t, f in info["frames"]] == [b"aa", b"bbb"]

    def test_unknown_size_other_elements_refused(self):
        # only Segment/Cluster may omit their size (Matroska profile):
        # an unknown-size Info is a named refusal
        good = encode_mkv([VIDEO], [])
        info_id = b"\x15\x49\xa9\x66"
        at = good.find(info_id)
        size_len = 9 - good[at + 4].bit_length()
        hacked = (
            good[: at + 4] + b"\xff"
            + good[at + 4 + size_len :]
        )
        with pytest.raises(NotImplementedError, match="unknown-size"):
            parse_mkv(hacked)

    def test_unknown_segment_truncation_still_raises(self):
        blob = encode_mkv(
            [VIDEO],
            [{"timestamp": 0, "blocks": [_simple(1, b"xxxx")]}],
            unknown_size="segment+clusters",
        )
        with pytest.raises(EOFError):
            parse_mkv(blob[:-3])

    def test_ebml_lace_overrun(self):
        # EBML lacing whose declared first size overruns the payload
        mkv = encode_mkv(
            [AUDIO],
            [{"timestamp": 0, "blocks": [
                {"track": 2, "frames_ebml": [b"aaaa", b"bb", b"c"]}]}],
        )
        # body = track(1)+ts(2)+flags(1)+count(1)+vint(1)+delta(1)+7 = 14
        i = mkv.find(b"\xa3\x8e\x82")  # full element prefix, not bare A3
        assert i >= 0
        hacked = bytearray(mkv)
        j = i + 2 + 4  # id(1) size(1) track(1) ts(2) flags(1) -> count byte
        assert hacked[j] == 2  # 3 frames -> count-1 == 2
        hacked[j + 1] = 0x80 | 120  # first size claims 120 bytes
        with pytest.raises(ValueError, match="overrun"):
            parse_mkv(bytes(hacked))

    def test_bad_doctype(self):
        mkv = encode_mkv([VIDEO], [], doc_type="avi?")
        with pytest.raises(ValueError, match="DocType"):
            parse_mkv(mkv)


class TestProperty:
    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.lists(st.binary(min_size=1, max_size=40), min_size=1, max_size=4),
            min_size=1,
            max_size=4,
        )
    )
    def test_frames_and_bytes_conserved(self, cluster_frames):
        clusters = []
        total = 0
        n = 0
        for ci, frames in enumerate(cluster_frames):
            blocks = [
                _simple(1, fr, key=(fi == 0)) for fi, fr in enumerate(frames)
            ]
            clusters.append({"timestamp": ci * 40, "blocks": blocks})
            total += sum(len(fr) for fr in frames)
            n += len(frames)
        info = parse_mkv(encode_mkv([VIDEO], clusters))
        assert info["n_frames"] == n
        assert info["media_bytes"] == total
        assert info["n_keyframes"] == len(cluster_frames)
        assert info["n_clusters"] == len(cluster_frames)


class TestLacingModes:
    def test_ebml_lacing_roundtrip(self):
        # ascending, descending and 255-boundary sizes through the
        # signed-delta table
        frames = [b"a" * 300, b"b" * 40, b"c" * 41, b"d" * 255]
        mkv = encode_mkv(
            [AUDIO],
            [{"timestamp": 0, "blocks": [{"track": 2, "frames_ebml": frames}]}],
        )
        info = parse_mkv(mkv)
        assert info["n_blocks"] == 1
        assert info["n_laced_blocks"] == 1
        assert info["n_frames"] == 4
        assert info["media_bytes"] == 300 + 40 + 41 + 255

    def test_fixed_lacing_roundtrip(self):
        frames = [b"x" * 24] * 5
        mkv = encode_mkv(
            [AUDIO],
            [{"timestamp": 0, "blocks": [{"track": 2, "frames_fixed": frames}]}],
        )
        info = parse_mkv(mkv)
        assert info["n_blocks"] == 1
        assert info["n_laced_blocks"] == 1
        assert info["n_frames"] == 5
        assert info["media_bytes"] == 120

    def test_fixed_lacing_uneven_rejected(self):
        mkv = bytearray(
            encode_mkv(
                [AUDIO],
                [{"timestamp": 0, "blocks": [
                    {"track": 2, "frames_fixed": [b"x" * 4] * 3}]}],
            )
        )
        # body = track(1)+ts(2)+flags(1)+count(1)+payload(12) = 17
        i = bytes(mkv).find(bytes([0xA3, 0x80 | 17, 0x82]))
        assert i >= 0
        # claim 5 frames over the 12-byte payload: 12 % 5 != 0
        j = i + 2 + 4  # count byte
        assert mkv[j] == 2
        mkv[j] = 4
        with pytest.raises(ValueError, match="divide"):
            parse_mkv(bytes(mkv))

    def test_fixed_lacing_unequal_writer_rejected(self):
        with pytest.raises(ValueError, match="equal frame sizes"):
            encode_mkv(
                [AUDIO],
                [{"timestamp": 0, "blocks": [
                    {"track": 2, "frames_fixed": [b"xx", b"yyy"]}]}],
            )

    def test_signed_vint_roundtrip(self):
        from tectonic_spark.operators.ebml import (
            _encode_signed_vint,
            _read_signed_vint,
        )

        for delta in (-63, -1, 0, 1, 62, 63, 64, -64, 8000, -8000):
            enc = _encode_signed_vint(delta)
            got, pos = _read_signed_vint(enc, 0)
            assert got == delta and pos == len(enc)

    def test_single_frame_laced_blocks(self):
        # 1-frame laced blocks carry NO size table (sizes cover all but
        # the last frame)
        for key in ("frames", "frames_ebml", "frames_fixed"):
            mkv = encode_mkv(
                [AUDIO],
                [{"timestamp": 0, "blocks": [{"track": 2, key: [b"only9byte"]}]}],
            )
            info = parse_mkv(mkv)
            assert info["n_frames"] == 1 and info["media_bytes"] == 9, key

"""H.264 Annex-B walker (m13): Exp-Golomb, SPS resolution math,
emulation prevention, frame-boundary census, raise behavior."""
from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    _ebsp,
    _unescape,
    encode_h264_annexb,
    parse_h264,
)


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 1000]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 17, -30]
    for v in svals:
        w.se(v)
    w.rbsp_trailing()
    r = _BitReader(w.bytes())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_ebsp_roundtrip_and_no_start_codes(raw):
    esc = _ebsp(raw)
    assert _unescape(esc) == raw
    assert b"\x00\x00\x01" not in esc
    assert b"\x00\x00\x00" not in esc


def test_census_matches_fixture_params():
    for d in range(0, 24):
        n_frames = 2 + d % 6
        p = encode_h264_annexb(
            n_frames,
            2 + d % 4,
            2 + d % 3,
            profile_idc=66 if d % 2 == 0 else 77,
            level_idc=30 + d % 3,
            crop_right=d % 2,
            crop_bottom=(d // 2) % 2,
            extra_slice_every=2 if d % 4 == 0 else 0,
        )
        info = parse_h264(p)
        assert info["n_frames"] == n_frames
        assert info["n_idr"] == 1
        extra = (n_frames + 1) // 2 if d % 4 == 0 else 0
        assert info["n_slices"] == n_frames + extra
        assert info["width"] == (2 + d % 4) * 16 - 2 * (d % 2)
        assert info["height"] == (2 + d % 3) * 16 - 2 * ((d // 2) % 2)
        assert info["profile_idc"] == (66 if d % 2 == 0 else 77)
        assert info["level_idc"] == 30 + d % 3
        assert info["bytes_walked"] == len(p)
        assert info["n_sps"] == 1 and info["n_pps"] == 1


def test_slice_payload_with_startcode_bytes_stays_one_nal():
    p = encode_h264_annexb(
        4, 3, 2, fill_fn=lambda i: b"\x00\x00\x01\x00\x00\x00\x00\x00\x02"
    )
    info = parse_h264(p)
    assert info["n_frames"] == 4
    assert info["n_slices"] == 4
    assert info["n_nals"] == 6  # SPS + PPS + 4 slices


def test_high_profile_sps_fields_parse():
    """profile_idc=100 adds chroma_format_idc/bit-depth fields before the
    frame-size fields — hand-build via the writer."""
    from tectonic_spark.operators.h264 import _nal, _slice_rbsp

    w = _BitWriter()
    w.u(100, 8)
    w.u(0, 8)
    w.u(41, 8)
    w.ue(0)  # sps_id
    w.ue(1)  # chroma_format_idc = 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # qpprime
    w.u(0, 1)  # no scaling matrix
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(0)  # poc_type 0
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(7)  # width 8 MBs
    w.ue(4)  # height 5 MBs
    w.u(1, 1)  # frame_mbs_only
    w.u(0, 1)
    w.u(0, 1)  # no cropping
    w.u(0, 1)  # no vui
    w.rbsp_trailing()
    stream = _nal(3, 7, w.bytes()) + _nal(3, 8, b"\x80") + _nal(
        3, 5, _slice_rbsp(0, 7, 0, b"\x42")
    )
    info = parse_h264(stream)
    assert (info["profile_idc"], info["level_idc"]) == (100, 41)
    assert (info["width"], info["height"]) == (128, 80)
    assert info["n_frames"] == 1


def test_raises_on_garbage_and_missing_sps():
    with pytest.raises(ValueError):
        parse_h264(b"\xde\xad\xbe\xef" * 10)
    from tectonic_spark.operators.h264 import _nal, _slice_rbsp

    with pytest.raises(ValueError):  # slices but no SPS
        parse_h264(_nal(3, 5, _slice_rbsp(0, 7, 0, b"")))
    # forbidden_zero_bit
    with pytest.raises(ValueError):
        parse_h264(b"\x00\x00\x00\x01\xff\x00")


def test_truncated_sps_raises():
    p = encode_h264_annexb(1, 4, 4)
    # cut inside the SPS NAL
    with pytest.raises(ValueError):
        parse_h264(p[:7])


class TestMp4Avcc:
    def test_mp4_census_matches_annexb(self):
        from tectonic_spark.operators.h264 import (
            encode_h264_annexb,
            encode_mp4_avcc,
            parse_h264,
            parse_mp4,
        )

        for params in [
            dict(n_frames=5, w_mbs=3, h_mbs=2, profile_idc=77, level_idc=31,
                 crop_right=1, crop_bottom=1, extra_slice_every=2),
            dict(n_frames=2, w_mbs=2, h_mbs=2),
            dict(n_frames=7, w_mbs=5, h_mbs=4, level_idc=32, crop_right=1,
                 extra_slice_every=3),
        ]:
            mp4 = encode_mp4_avcc(**params)
            ref = parse_h264(encode_h264_annexb(**params))
            info = parse_mp4(mp4)
            for k in ("n_sps", "n_pps", "n_slices", "n_frames", "n_idr",
                      "width", "height", "profile_idc", "level_idc"):
                assert info[k] == ref[k], (params, k)
            assert info["bytes_walked"] == len(mp4)
            assert info["length_size"] == 4

    def test_mp4_malformed_raises(self):
        import pytest

        from tectonic_spark.operators.h264 import encode_mp4_avcc, parse_mp4

        good = encode_mp4_avcc(3, 2, 2)
        with pytest.raises(ValueError):
            parse_mp4(b"not an mp4 at all")
        with pytest.raises(ValueError):
            parse_mp4(good[:-7])  # truncated moov box
        # truncated NAL inside mdat: cut mid-mdat, keep a valid moov by
        # rebuilding — simpler: corrupt a NAL length to overrun
        bad = bytearray(good)
        mdat = bad.find(b"mdat")
        bad[mdat + 4 : mdat + 8] = (2**31).to_bytes(4, "big")
        with pytest.raises(ValueError):
            parse_mp4(bytes(bad))

    def test_m01_routes_mp4(self):
        from tectonic_spark.operators.h264 import encode_mp4_avcc
        from tectonic_spark.operators.multimodal import _decode_image_real

        p = encode_mp4_avcc(4, 3, 2, crop_right=1)
        kind, w, h, nf = _decode_image_real(p)
        assert (kind, w, h, nf) == ("video", 46, 32, 4)

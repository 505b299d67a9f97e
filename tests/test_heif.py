"""HEIF/AVIF census tests: item structure round-trips (primary-only,
alpha, bit depths), extent verification, error taxonomy, Hypothesis
sweep over dimensions/payload sizes."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.heif import encode_avif, parse_avif


class TestRoundtrip:
    def test_primary_only(self):
        b = encode_avif(width=320, height=240, primary_payload=b"\x12" * 200)
        info = parse_avif(b)
        assert (info["brand"], info["n_items"]) == ("avif", 1)
        assert (info["width"], info["height"]) == (320, 240)
        assert info["primary_type"] == "av01"
        assert info["has_alpha"] is False
        assert info["total_item_bytes"] == 200
        assert info["extents_ok"] and info["bytes_walked"] == len(b)

    def test_with_alpha(self):
        b = encode_avif(
            width=64, height=48, primary_payload=b"p" * 100,
            alpha_payload=b"a" * 50, bit_depth=10,
        )
        info = parse_avif(b)
        assert info["n_items"] == 2 and info["has_alpha"] is True
        assert info["total_item_bytes"] == 150 and info["bit_depth"] == 10

    def test_extents_point_at_true_payloads(self):
        prim, alph = b"P" * 77, b"A" * 33
        b = encode_avif(
            width=8, height=8, primary_payload=prim, alpha_payload=alph
        )
        info = parse_avif(b)
        (o1, l1), = info["extents"][1]
        (o2, l2), = info["extents"][2]
        assert b[o1 : o1 + l1] == prim
        assert b[o2 : o2 + l2] == alph


class TestErrors:
    def test_not_heif(self):
        b = bytearray(encode_avif(width=8, height=8, primary_payload=b"x"))
        i = bytes(b).find(b"avif")
        b[i : i + 4] = b"isom"  # mp4 brand, not a still
        b[i + 8 : i + 12] = b"isom"
        with pytest.raises(ValueError, match="brand"):
            parse_avif(bytes(b))

    def test_truncated(self):
        b = encode_avif(width=8, height=8, primary_payload=b"x" * 50)
        with pytest.raises((ValueError, EOFError)):
            parse_avif(b[:-9])

    def test_extent_outside_mdat_flagged(self):
        b = bytearray(encode_avif(width=8, height=8, primary_payload=b"x" * 50))
        # iloc extent offset is the last-but-one u32 before mdat; bump
        # the length so the extent overruns the file
        info = parse_avif(bytes(b))
        (off, ln), = info["extents"][1]
        pat = struct.pack(">II", off, ln)
        i = bytes(b).find(pat)
        b[i : i + 8] = struct.pack(">II", off, ln + 500)
        assert parse_avif(bytes(b))["extents_ok"] is False

    def test_missing_av1c_rejected(self):
        b = bytearray(encode_avif(width=8, height=8, primary_payload=b"x"))
        i = bytes(b).find(b"av1C")
        b[i : i + 4] = b"zzzC"  # same size, unknown property type
        with pytest.raises(ValueError, match="av1C"):
            parse_avif(bytes(b))

    def test_wrong_handler_rejected(self):
        b = bytearray(encode_avif(width=8, height=8, primary_payload=b"x"))
        i = bytes(b).find(b"pict")
        b[i : i + 4] = b"vide"
        with pytest.raises(ValueError, match="pict"):
            parse_avif(bytes(b))

    def test_iloc_v3_refused(self):
        b = bytearray(encode_avif(width=8, height=8, primary_payload=b"x"))
        i = bytes(b).find(b"iloc")
        b[i + 4] = 3  # version byte of the fullbox
        with pytest.raises(NotImplementedError, match="iloc version"):
            parse_avif(bytes(b))

    def test_iloc_construction_method_2_refused(self):
        b = bytearray(
            encode_avif(
                width=8, height=8, primary_payload=b"x", iloc_version=1,
                construction="idat",
            )
        )
        i = bytes(b).find(b"iloc")
        # tag(4) ver+flags(4) sizes(2) count(2) item_ID(2) then the
        # 12+4 construction-method halfword — flip method 1 -> 2
        p = i + 4 + 4 + 2 + 2 + 2 + 1
        assert b[p] == 1
        b[p] = 2
        with pytest.raises(NotImplementedError, match="method 2"):
            parse_avif(bytes(b))

    def test_iloc_lane_round_trips(self):
        # the m27 lane matrix: v0-file / v1-base / v1-idat / v2-file
        lanes = [
            (dict(iloc_version=0), 0),
            (dict(iloc_version=1, base_offset=True), 0),
            (dict(iloc_version=1, construction="idat"), 1),
            (dict(iloc_version=2), 0),
            (dict(iloc_version=2, construction="idat"), 1),
        ]
        for kwargs, want_method in lanes:
            blob = encode_avif(
                width=64, height=48, primary_payload=b"P" * 99,
                alpha_payload=b"A" * 33, bit_depth=10, **kwargs,
            )
            info = parse_avif(blob)
            assert info["extents_ok"], kwargs
            assert info["total_item_bytes"] == 132
            assert info["iloc_version"] == kwargs.get("iloc_version", 0)
            assert all(
                m == want_method for m in info["methods"].values()
            ), kwargs
            assert info["bytes_walked"] == len(blob)

    def test_idat_needs_v1(self):
        with pytest.raises(ValueError, match="idat construction"):
            encode_avif(
                width=8, height=8, primary_payload=b"x", iloc_version=0,
                construction="idat",
            )


class TestProperty:
    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=1, max_value=4096),
        st.integers(min_value=1, max_value=4096),
        st.binary(min_size=1, max_size=400),
        st.one_of(st.none(), st.binary(min_size=1, max_size=200)),
    )
    def test_census_conserves(self, w, h, prim, alph):
        b = encode_avif(
            width=w, height=h, primary_payload=prim, alpha_payload=alph
        )
        info = parse_avif(b)
        assert (info["width"], info["height"]) == (w, h)
        assert info["n_items"] == (2 if alph is not None else 1)
        assert info["has_alpha"] == (alph is not None)
        assert info["total_item_bytes"] == len(prim) + (
            len(alph) if alph is not None else 0
        )
        assert info["extents_ok"] and info["bytes_walked"] == len(b)

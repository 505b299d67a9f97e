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

    def test_iloc_method_2_without_index_size_rejected(self):
        # flipping a method-1 entry to method 2 leaves index_size 0 —
        # structurally invalid (the extent_index field is missing)
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
        with pytest.raises(ValueError, match="index_size"):
            parse_avif(bytes(b))

    def test_reserved_method_rejected(self):
        b = bytearray(
            encode_avif(
                width=8, height=8, primary_payload=b"x", iloc_version=1,
                construction="idat",
            )
        )
        i = bytes(b).find(b"iloc")
        p = i + 4 + 4 + 2 + 2 + 2 + 1
        b[p] = 3
        with pytest.raises(ValueError, match="reserved iloc construction"):
            parse_avif(bytes(b))


class TestConstructionMethod2:
    def _blob(self, span=(30, 90), **kw):
        return encode_avif(
            width=64, height=48, primary_payload=bytes(range(200)),
            derived_span=span, **kw,
        )

    @pytest.mark.parametrize("ver", [1, 2])
    def test_derived_item_round_trip(self, ver):
        info = parse_avif(self._blob(iloc_version=ver))
        assert info["methods"][3] == 2
        assert info["extents_ok"]
        assert info["extents"][3] == [(30, 90)]
        assert info["total_item_bytes"] == 200 + 90

    def test_alpha_and_derived_coexist(self):
        blob = encode_avif(
            width=64, height=48, primary_payload=bytes(range(200)),
            alpha_payload=bytes(60), iloc_version=2,
            derived_span=(0, 200),
        )
        info = parse_avif(blob)
        assert info["n_items"] == 3 and info["has_alpha"]
        assert info["methods"] == {1: 0, 2: 0, 3: 2}
        assert info["extents_ok"]

    def test_span_past_source_flags_extents(self):
        # lengthen the derived extent past the primary's size: the
        # source-bounds check must flag it (offset 30 + 180 > 200)
        b = bytearray(self._blob(iloc_version=1))
        i = bytes(b).find(b"iloc")
        # find the method-2 entry's length field: last 4 bytes of the
        # iloc body are (offset, length) of entry 3
        (size,) = __import__("struct").unpack_from(">I", bytes(b), i - 4)
        end = i - 4 + size
        b[end - 4 : end] = (180).to_bytes(4, "big")
        info = parse_avif(bytes(b))
        assert info["extents_ok"] is False

    def test_missing_iloc_reference_rejected(self):
        b = bytearray(self._blob(iloc_version=1))
        i = bytes(b).find(b"iref")
        # retype the iref's iloc child so item 3 has no source list
        j = bytes(b).find(b"iloc", i)
        b[j : j + 4] = b"thmb"
        with pytest.raises(ValueError, match="no 'iloc' item reference"):
            parse_avif(bytes(b))

    def test_zero_extent_index_rejected(self):
        b = bytearray(self._blob(iloc_version=1))
        i = bytes(b).find(b"iloc")
        (size,) = __import__("struct").unpack_from(">I", bytes(b), i - 4)
        end = i - 4 + size
        # entry 3 tail: extent_index(4) offset(4) length(4)
        b[end - 12 : end - 8] = (0).to_bytes(4, "big")
        with pytest.raises(ValueError, match="1-based"):
            parse_avif(bytes(b))

    def test_self_reference_cycle_rejected(self):
        b = bytearray(self._blob(iloc_version=1))
        i = bytes(b).find(b"iref")
        j = bytes(b).find(b"iloc", i)
        # iloc ref payload: from(2) count(2) to(2) -> point 3 at itself
        b[j + 4 + 4 : j + 4 + 6] = (3).to_bytes(2, "big")
        with pytest.raises(ValueError, match="cycle"):
            parse_avif(bytes(b))

    def test_writer_validation(self):
        with pytest.raises(ValueError, match="version >= 1"):
            self._blob(iloc_version=0)
        with pytest.raises(ValueError, match="exceeds the primary"):
            self._blob(span=(150, 100), iloc_version=1)

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

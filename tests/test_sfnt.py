"""cmap format 4 + hmtx codec tests (operators/sfnt.py): both
addressing lanes (idDelta arithmetic runs, idRangeOffset glyphIdArray
indirection with the spec's from-the-slot pointer arithmetic), the
terminator segment, searchRange arithmetic, the short-form hmtx, and
the error taxonomy."""

from __future__ import annotations

import struct

import pytest

from tectonic_spark.operators.sfnt import (
    build_cmap4,
    build_hmtx,
    parse_cmap4,
    parse_hmtx,
)


class TestCmap4:
    def test_arithmetic_run_uses_id_delta(self):
        m = {c: c - 64 for c in range(65, 91)}
        blob = build_cmap4(m)
        info = parse_cmap4(blob)
        assert info["mapping"] == m
        assert info["n_segments"] == 1
        assert info["n_glyph_id_array"] == 0  # pure idDelta

    def test_scattered_run_uses_indirection(self):
        m = {c: 500 - c for c in range(100, 120)}  # reversed: not c+delta
        info = parse_cmap4(build_cmap4(m))
        assert info["mapping"] == m
        assert info["n_glyph_id_array"] == 20

    def test_mixed_runs_and_isolated_chars(self):
        m = {c: c - 64 for c in range(65, 75)}
        m.update({c: 999 - c for c in range(200, 210)})
        m[0x2603] = 77
        m[0xFFFD] = 3
        info = parse_cmap4(build_cmap4(m))
        assert info["mapping"] == m
        assert info["search_ok"]

    def test_round_trip_random(self):
        import random

        rng = random.Random(41)
        for _ in range(20):
            m = {}
            for _ in range(rng.randrange(1, 60)):
                m[rng.randrange(1, 0xFFFE)] = rng.randrange(1, 0xFFFF)
            assert parse_cmap4(build_cmap4(m))["mapping"] == m

    def test_zero_gid_unmapped(self):
        # glyphIdArray entries of 0 mean "not mapped" per the spec
        m = {100: 7, 101: 3, 102: 9}  # indirection lane
        blob = bytearray(build_cmap4(m))
        # zero out the middle glyphIdArray entry (last 3 UInt16s)
        blob[-4:-2] = b"\x00\x00"
        got = parse_cmap4(bytes(blob))["mapping"]
        assert got == {100: 7, 102: 9}

    def test_taxonomy(self):
        blob = build_cmap4({65: 1})
        with pytest.raises(EOFError):
            parse_cmap4(blob[:2])
        bad = bytearray(blob)
        bad[0:2] = struct.pack(">H", 1)  # version
        with pytest.raises(ValueError, match="version"):
            parse_cmap4(bytes(bad))
        bad = bytearray(blob)
        bad[6:8] = struct.pack(">H", 0)  # encodingID 1 -> 0
        with pytest.raises(ValueError, match=r"\(3,1\)"):
            parse_cmap4(bytes(bad))
        bad = bytearray(blob)
        bad[12:14] = struct.pack(">H", 6)  # subtable format
        with pytest.raises(ValueError, match="format"):
            parse_cmap4(bytes(bad))
        with pytest.raises(ValueError, match="BMP"):
            build_cmap4({0x10000: 1})
        with pytest.raises(ValueError, match="empty"):
            build_cmap4({})

    def test_reserved_pad_checked(self):
        blob = bytearray(build_cmap4({65: 1, 66: 2}))
        # reservedPad sits after endCode[segCount]; segs = run + term
        seg_count = struct.unpack(">H", blob[12 + 6 : 12 + 8])[0] // 2
        pad_off = 12 + 14 + 2 * seg_count
        assert blob[pad_off : pad_off + 2] == b"\x00\x00"
        blob[pad_off] = 1
        with pytest.raises(ValueError, match="reservedPad"):
            parse_cmap4(bytes(blob))


class TestHmtx:
    def test_long_and_short_forms(self):
        adv = [500, 510, 520, 520, 520]
        lsb = [1, -2, 3, -4, 5]
        full = parse_hmtx(build_hmtx(adv, lsb, 5), 5, 5)
        assert full["advances"] == adv and full["n_short"] == 0
        short = parse_hmtx(build_hmtx(adv, lsb, 3), 3, 5)
        assert short["advances"] == adv and short["lsbs"] == lsb
        assert short["n_short"] == 2
        assert short["sum_advance"] == sum(adv)
        # the short encoding is actually smaller
        assert len(build_hmtx(adv, lsb, 3)) < len(build_hmtx(adv, lsb, 5))

    def test_nonconstant_tail_rejected(self):
        with pytest.raises(ValueError, match="constant advance"):
            build_hmtx([500, 510, 520], [0, 0, 0], 2)

    def test_size_taxonomy(self):
        blob = build_hmtx([500, 500], [1, 2], 1)
        with pytest.raises(EOFError):
            parse_hmtx(blob[:-1], 1, 2)
        with pytest.raises(ValueError, match="bytes"):
            parse_hmtx(blob + b"\x00\x00", 1, 2)
        with pytest.raises(ValueError, match="numberOfHMetrics"):
            parse_hmtx(blob, 3, 2)
        with pytest.raises(ValueError, match="numberOfHMetrics"):
            parse_hmtx(blob, 0, 2)

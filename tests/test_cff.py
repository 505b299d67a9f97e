"""CFF codec tests (operators/cff.py): INDEX offsets/OffSize, all
DICT operand encodings (four integer forms, nibble-BCD reals,
12-escape operators), the bounded Type 2 interpreter (width-parity
rule, per-op operand validation), font assembly fix-point, and the
error taxonomy."""

from __future__ import annotations

import pytest

from tectonic_spark.operators.cff import (
    _build_index,
    _parse_index,
    build_cff,
    build_charstring,
    build_dict,
    parse_cff,
    parse_dict,
    run_charstring,
)


class TestIndex:
    def test_round_trip_and_offsize_growth(self):
        small = [b"a", b"bb", b"", b"ccc"]
        blob = _build_index(small)
        assert blob[2] == 1  # OffSize 1
        items, end = _parse_index(blob, 0)
        assert items == small and end == len(blob)
        big = [b"x" * 300]
        blob = _build_index(big)
        assert blob[2] == 2  # 301 needs two bytes
        assert _parse_index(blob, 0)[0] == big

    def test_empty_index_is_two_bytes(self):
        blob = _build_index([])
        assert blob == b"\x00\x00"
        assert _parse_index(blob, 0) == ([], 2)

    def test_taxonomy(self):
        blob = _build_index([b"abc"])
        with pytest.raises(EOFError):
            _parse_index(blob[:-2], 0)
        bad = bytearray(blob)
        bad[2] = 5
        with pytest.raises(ValueError, match="offSize"):
            _parse_index(bytes(bad), 0)
        bad = bytearray(blob)
        bad[3] = 2  # first offset must be 1
        with pytest.raises(ValueError, match="start at 1"):
            _parse_index(bytes(bad), 0)


class TestDict:
    def test_all_integer_encodings(self):
        d = [(0, [-107, 107]), (1, [108, 1131]), (2, [-108, -1131]),
             (3, [-32768, 32767]), (4, [32768, -70000, 2 ** 30])]
        blob = build_dict(d)
        got = parse_dict(blob)
        for op, vals in d:
            assert got[op] == vals

    def test_escape_operators(self):
        got = parse_dict(build_dict([(0x0C07, [1, 2, 3]), (17, [9])]))
        assert got[0x0C07] == [1, 2, 3] and got[17] == [9]

    def test_reals(self):
        for v in (0.125, -3.5, 1250.0625):
            got = parse_dict(build_dict([(7, [v])]))
            assert got[7][0] == pytest.approx(v)

    def test_dangling_operands_rejected(self):
        with pytest.raises(ValueError, match="dangling"):
            parse_dict(build_dict([(17, [5])]) + b"\x8b")

    def test_truncations(self):
        for blob in (b"\x1c\x00", b"\x1d\x00\x00", b"\xf7", b"\x1e\x12"):
            with pytest.raises(EOFError):
                parse_dict(blob)


class TestCharstrings:
    def test_width_parity_rule(self):
        # stems: odd operand count means leading width
        cs = build_charstring([("hstem", [10, 20]), ("endchar", [])],
                              width=77)
        st = run_charstring(cs, nominal_width=400)
        assert st["width"] == 477 and st["n_stems"] == 1
        # no width: even count
        cs = build_charstring([("hstem", [10, 20]), ("endchar", [])])
        assert run_charstring(cs)["width"] is None
        # width before rmoveto (3 operands instead of 2)
        cs = build_charstring([("rmoveto", [5, 6]), ("endchar", [])],
                              width=-30)
        assert run_charstring(cs, nominal_width=100)["width"] == 70
        # width on a bare endchar
        cs = build_charstring([("endchar", [])], width=250)
        assert run_charstring(cs)["width"] == 250

    def test_path_accumulation(self):
        cs = build_charstring(
            [("rmoveto", [100, 200]), ("rlineto", [10, 0, 0, 10, -5, -5]),
             ("rrcurveto", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]),
             ("endchar", [])]
        )
        st = run_charstring(cs)
        assert st["n_points"] == 1 + 3 + 6
        assert st["x"] == 100 + 5 + (1 + 3 + 5) + (7 + 9 + 11)
        assert st["y"] == 200 + 5 + (2 + 4 + 6) + (8 + 10 + 12)

    def test_taxonomy(self):
        with pytest.raises(ValueError, match="missing endchar"):
            run_charstring(build_charstring([("rmoveto", [1, 2])]))
        with pytest.raises(ValueError, match="outside the subset"):
            run_charstring(bytes([0x8B, 0x8B, 24]))  # vvcurveto
        with pytest.raises(ValueError, match="odd stem"):
            run_charstring(bytes([0x8B, 1]) + b"\x0e")  # hstem w/ 1 opnd
        bad = build_charstring([("endchar", [])]) + b"\x0e"
        with pytest.raises(ValueError, match="after endchar"):
            run_charstring(bad)
        with pytest.raises(ValueError, match="rlineto"):
            run_charstring(bytes([0x8C, 0x8C, 21, 0x8C, 5, 14]))


class TestFontAssembly:
    def _font(self, n=5):
        css = [
            build_charstring(
                [("rmoveto", [10 * g, 5]), ("rlineto", [4, 4]),
                 ("endchar", [])],
                width=100 + g,
            )
            for g in range(n)
        ]
        return build_cff("Fixture-Font", css,
                         private_entries=[(20, [333]), (21, [50])]), css

    def test_round_trip_census(self):
        font, css = self._font()
        info = parse_cff(font)
        assert info["name"] == "Fixture-Font"
        assert info["n_glyphs"] == 5
        assert info["n_points"] == 10  # 2 per glyph
        assert info["sum_width"] == sum(150 + g for g in range(5))
        assert info["charstring_bytes"] == sum(len(c) for c in css)

    def test_default_width_applies(self):
        css = [build_charstring([("endchar", [])])]  # no width operand
        info = parse_cff(build_cff("F", css,
                                   private_entries=[(20, [42]), (21, [0])]))
        assert info["glyphs"][0]["width"] == 42

    def test_offset_fixpoint_stable_across_sizes(self):
        # tiny and large fonts both converge and re-parse
        for n in (1, 40):
            font, _ = self._font(n)
            assert parse_cff(font)["n_glyphs"] == n

    def test_taxonomy(self):
        font, _ = self._font()
        with pytest.raises(EOFError):
            parse_cff(font[:2])
        bad = bytearray(font)
        bad[0] = 2
        with pytest.raises(ValueError, match="major"):
            parse_cff(bytes(bad))
        # missing CharStrings op: build a top dict without 17
        from tectonic_spark.operators.cff import _build_index

        header = bytes([1, 0, 4, 4])
        blob = (header + _build_index([b"N"])
                + _build_index([build_dict([(15, [0])])])
                + _build_index([]) + _build_index([]))
        with pytest.raises(ValueError, match="CharStrings"):
            parse_cff(blob)

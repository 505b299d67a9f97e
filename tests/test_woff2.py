"""WOFF2 container tests (operators/woff2.py): round-trips over the
brotli-mode x metadata matrix, the spec arithmetic, UIntBase128 /
255UInt16 / triplet edge forms, the glyf/loca preprocessing transform
(encode -> reconstruct pinned byte-for-byte against the direct
serializer), the sfnt checksum layer, and the error taxonomy
(truncation EOFError, structural ValueError)."""

from __future__ import annotations

import itertools
import struct

import pytest

from tectonic_spark.operators.woff2 import (
    _decode_triplet,
    _encode_triplet,
    _read_255ushort,
    _read_base128,
    _write_255ushort,
    _write_base128,
    build_glyf,
    encode_woff2,
    glyph_composite,
    glyph_simple,
    parse_woff2,
    reconstruct_sfnt,
    reconstruct_transformed_glyf,
    transform_glyf,
    verify_sfnt,
)


def _head(upem=1000, loca_fmt=0):
    h = bytearray(54)
    h[12:16] = struct.pack(">I", 0x5F0F3CF5)
    h[18:20] = struct.pack(">H", upem)
    h[50:52] = struct.pack(">h", loca_fmt)
    return bytes(h)


def _tables(ng=20, glyf_len=150, upem=1000, lf=0):
    return [
        (b"head", _head(upem, lf)),
        (b"maxp", struct.pack(">IH", 0x00010000, ng) + b"\x00" * 26),
        (b"hhea", b"\x00" * 34 + struct.pack(">H", ng)),
        (b"hmtx", bytes(4 * ng)),
        (b"glyf", bytes((j * 7) % 256 for j in range(glyf_len))),
        (b"loca", bytes((ng + 1) * (2 + 2 * lf))),
        (b"name", b"Test Font"),
        (b"cmap", bytes(20)),
    ]


class TestRoundTrip:
    @pytest.mark.parametrize("mode", ["lz", "dict", "literals"])
    @pytest.mark.parametrize("meta", [None, b"<metadata>x</metadata>"])
    def test_census_fields(self, mode, meta):
        blob = encode_woff2(_tables(ng=33, upem=2048, lf=1),
                            br_mode=mode, metadata=meta)
        info = parse_woff2(blob)
        assert info["flavor"] == "ttf"
        assert info["n_tables"] == 8
        assert info["units_per_em"] == 2048
        assert info["loca_format"] == 1
        assert info["num_glyphs"] == 33
        assert info["num_hmetrics"] == 33
        assert info["sfnt_size_ok"] and info["stream_ok"]
        assert info["bytes_walked"] == len(blob)
        assert info["meta_orig_len"] == (len(meta) if meta else 0)
        assert info["tags"] == sorted(
            ["cmap", "glyf", "head", "hhea", "hmtx", "loca", "maxp", "name"]
        )

    def test_arbitrary_tag_and_otto_flavor(self):
        tabs = _tables() + [(b"Zapf", b"custom table bytes")]
        blob = encode_woff2(tabs, flavor=b"OTTO")
        info = parse_woff2(blob)
        assert info["flavor"] == "otto"
        assert "Zapf" in info["tags"] and info["n_tables"] == 9

    def test_total_orig_bytes(self):
        tabs = _tables(ng=10, glyf_len=77)
        blob = encode_woff2(tabs)
        info = parse_woff2(blob)
        assert info["total_orig_bytes"] == sum(len(b) for _t, b in tabs)


class TestBase128:
    def test_round_trip_values(self):
        for v in (0, 1, 127, 128, 255, 16384, (1 << 32) - 1):
            enc = _write_base128(v)
            got, pos = _read_base128(enc, 0)
            assert got == v and pos == len(enc)

    def test_leading_zero_byte_rejected(self):
        with pytest.raises(ValueError, match="leading zero"):
            _read_base128(b"\x80\x01", 0)

    def test_overlong_rejected(self):
        # small value, 6 continuation bytes: the >5-byte form
        with pytest.raises(ValueError, match="5 bytes"):
            _read_base128(b"\x81\x80\x80\x80\x80\x00", 0)

    def test_overflow_rejected(self):
        with pytest.raises(ValueError, match="overflow"):
            _read_base128(b"\x90\x80\x80\x80\x00", 0)

    def test_truncated(self):
        with pytest.raises(EOFError):
            _read_base128(b"\xff", 0)


class TestTaxonomy:
    def test_bad_signature(self):
        blob = bytearray(encode_woff2(_tables()))
        blob[0] = 0x77 + 1
        with pytest.raises(ValueError, match="signature"):
            parse_woff2(bytes(blob))

    def test_truncated_header(self):
        with pytest.raises(EOFError):
            parse_woff2(encode_woff2(_tables())[:30])

    def test_truncated_stream(self):
        blob = bytearray(encode_woff2(_tables())[:-5])
        blob[8:12] = struct.pack(">I", len(blob))  # keep length field true
        with pytest.raises(EOFError, match="compressed stream"):
            parse_woff2(bytes(blob))

    def test_length_field_mismatch(self):
        blob = encode_woff2(_tables())
        with pytest.raises(ValueError, match="length field"):
            parse_woff2(blob + b"\x00")

    def test_transform_flag_without_transform_data_rejected(self):
        # flip glyf's transform version from 3 (null) to 0 (transformed)
        # WITHOUT supplying a transformLength or transformed payload:
        # the directory/stream walk must fail structurally, never
        # misread raw glyf bytes as a transform
        blob = bytearray(encode_woff2(_tables()))
        pos = 48
        # directory entry 2 is glyf (sorted tags: cmap glyf head ...)
        # entry 1 starts after cmap's flags+base128(20)
        assert blob[pos] & 0x3F == 0  # cmap known index
        pos += 2  # flags + 1-byte length (20)
        assert blob[pos] & 0x3F == 10 and blob[pos] >> 6 == 3  # glyf, null
        blob[pos] = 10  # transform version 0 = preprocessed glyf
        with pytest.raises((ValueError, EOFError)):
            parse_woff2(bytes(blob))

    def test_reserved_transform_on_other_table_rejected(self):
        blob = bytearray(encode_woff2(_tables()))
        assert blob[48] & 0x3F == 0 and blob[48] >> 6 == 0  # cmap, null
        blob[48] |= 1 << 6
        with pytest.raises(ValueError, match="reserved transform"):
            parse_woff2(bytes(blob))

    def test_corrupt_compressed_stream(self):
        blob = bytearray(encode_woff2(_tables(), br_mode="literals"))
        blob[-1] ^= 0xFF
        with pytest.raises((ValueError, EOFError)):
            parse_woff2(bytes(blob))

    def test_bad_head_magic(self):
        tabs = _tables()
        bad = bytearray(tabs[0][1])
        bad[12] ^= 1
        tabs[0] = (b"head", bytes(bad))
        with pytest.raises(ValueError, match="head table magic"):
            parse_woff2(encode_woff2(tabs))

    def test_metadata_length_pins(self):
        blob = encode_woff2(_tables(), metadata=b"<m/>" * 10)
        assert parse_woff2(blob)["meta_orig_len"] == 40


def _model_glyphs():
    """The fixture glyph model exercising every transform lane: an
    empty glyph, single/multi-contour simple glyphs (on/off-curve,
    negative coords, deltas spanning every triplet size class),
    instructions, overlap, and a composite with word/byte args, an
    F2Dot14 scale and instructions."""
    return [
        None,
        glyph_simple([[(10, 20, True), (50, 20, False), (50, 80, True),
                       (10, 80, True)]]),
        glyph_simple(
            [[(0, 0, True), (300, 0, True), (300, 700, True)],
             [(1000, -500, False), (5000, 4000, True), (-2000, 3000, True)]],
            instructions=b"\x01\x02\x03",
            overlap=True,
        ),
        glyph_composite(
            [{"glyph_index": 1, "dx": 5, "dy": -3, "scale": 0.5},
             {"glyph_index": 2, "dx": 300, "dy": -200, "scale": None}],
            bbox=(-10, -10, 600, 900),
            instructions=b"\xAA",
        ),
        glyph_simple([[(0, 0, True), (0, 20000, True), (-30000, 5, True)]]),
    ]


class Test255UShort:
    def test_round_trip_boundaries(self):
        for v in (0, 1, 252, 253, 505, 506, 761, 762, 1000, 65535):
            enc = _write_255ushort(v)
            got, pos = _read_255ushort(enc, 0)
            assert got == v and pos == len(enc), v

    def test_shortest_form_sizes(self):
        assert len(_write_255ushort(252)) == 1
        assert len(_write_255ushort(253)) == 2
        assert len(_write_255ushort(761)) == 2
        assert len(_write_255ushort(762)) == 3

    def test_truncated(self):
        for blob in (b"", b"\xff", b"\xfe", b"\xfd\x01"):
            with pytest.raises(EOFError):
                _read_255ushort(blob, 0)

    def test_out_of_range(self):
        with pytest.raises(ValueError):
            _write_255ushort(0x10000)


class TestTriplets:
    def test_round_trip_matrix(self):
        vals = (0, 1, 2, 15, 16, 63, 64, 65, 255, 256, 767, 768, 769,
                1279, 1280, 4095, 4096, 16384, 32767)
        for ax, ay in itertools.product(vals, vals):
            for sx, sy in itertools.product((1, -1), repeat=2):
                dx, dy = ax * sx, ay * sy
                for on in (True, False):
                    f, data = _encode_triplet(dx, dy, on)
                    got_on, gdx, gdy, used = _decode_triplet(f, data, 0)
                    assert used == len(data)
                    assert (got_on, gdx, gdy) == (on, dx, dy), (dx, dy, f)

    def test_size_classes(self):
        # flag ranges select the spec's byte counts: 1 data byte
        # below 84, 2 below 120, 3 below 124, 4 above
        assert len(_encode_triplet(0, 1279, True)[1]) == 1
        assert len(_encode_triplet(64, 64, True)[1]) == 1
        assert len(_encode_triplet(768, 768, True)[1]) == 2
        assert len(_encode_triplet(4095, 4095, True)[1]) == 3
        assert len(_encode_triplet(4096, 1, True)[1]) == 4

    def test_off_curve_sets_top_bit(self):
        f_on, _ = _encode_triplet(5, 5, True)
        f_off, _ = _encode_triplet(5, 5, False)
        assert f_off == f_on | 0x80

    def test_truncated_data(self):
        f, data = _encode_triplet(4096, 4096, True)
        with pytest.raises(EOFError):
            _decode_triplet(f, data[:-1], 0)


class TestGlyfTransform:
    @pytest.mark.parametrize("lf", [0, 1])
    def test_reconstruct_matches_direct_serialization(self, lf):
        glyphs = _model_glyphs()
        glyf, loca = build_glyf(glyphs, lf)
        rec = reconstruct_transformed_glyf(
            transform_glyf(glyphs, lf, explicit_bbox={1})
        )
        assert rec["glyf"] == glyf
        assert rec["loca"] == loca
        assert rec["num_glyphs"] == 5
        assert rec["n_points"] == 13 and rec["n_contours"] == 4
        assert rec["n_composites"] == 1 and rec["n_empty"] == 1
        assert rec["n_explicit_bbox"] == 2  # lane glyph + the composite
        assert rec["n_overlap"] == 1

    def test_no_overlap_drops_option_flag(self):
        glyphs = [glyph_simple([[(0, 0, True), (10, 0, True),
                                 (5, 10, True)]])]
        t = transform_glyf(glyphs, 0)
        assert struct.unpack(">H", t[2:4])[0] == 0  # optionFlags
        rec = reconstruct_transformed_glyf(t)
        assert rec["n_overlap"] == 0
        assert rec["glyf"] == build_glyf(glyphs, 0)[0]

    def test_loca_format0_requires_even_offsets(self):
        # every reconstructed glyph is 2-padded, so format 0 always
        # has even offsets; check via a glyph with odd instruction len
        glyphs = [glyph_simple([[(0, 0, True), (8, 0, True),
                                 (4, 6, True)]], instructions=b"\x07")]
        glyf, loca = build_glyf(glyphs, 0)
        assert len(glyf) % 2 == 0
        rec = reconstruct_transformed_glyf(transform_glyf(glyphs, 0))
        assert rec["loca"] == loca

    def test_composite_without_bbox_rejected(self):
        glyphs = [_model_glyphs()[3]]
        t = bytearray(transform_glyf(glyphs, 0))
        # bbox stream starts after the five preceding streams; its
        # first byte is the bitmap byte carrying glyph 0's bit
        sizes = struct.unpack(">IIIIIII", t[8:36])
        bbox_off = 36 + sum(sizes[:4]) + sizes[4]
        assert t[bbox_off] & 0x80
        t[bbox_off] &= 0x7F
        with pytest.raises(ValueError, match="without explicit bbox"):
            reconstruct_transformed_glyf(bytes(t))

    def test_empty_glyph_with_bbox_rejected(self):
        glyphs = [None, glyph_simple([[(0, 0, True), (9, 0, True),
                                       (9, 9, True)]])]
        t = bytearray(transform_glyf(glyphs, 0))
        sizes = struct.unpack(">IIIIIII", t[8:36])
        bbox_off = 36 + sum(sizes[:5])
        t[bbox_off] |= 0x80  # glyph 0 (the empty one)
        with pytest.raises(ValueError, match="empty glyph"):
            reconstruct_transformed_glyf(bytes(t))

    def test_reserved_version_and_option_flags(self):
        t = bytearray(transform_glyf(_model_glyphs(), 0))
        bad = bytearray(t)
        bad[1] = 1
        with pytest.raises(ValueError, match="version"):
            reconstruct_transformed_glyf(bytes(bad))
        bad = bytearray(t)
        bad[3] |= 0x02
        with pytest.raises(ValueError, match="optionFlags"):
            reconstruct_transformed_glyf(bytes(bad))

    def test_undigested_stream_bytes_rejected(self):
        glyphs = [glyph_simple([[(0, 0, True), (10, 0, True),
                                 (5, 10, True)]])]
        t = bytearray(transform_glyf(glyphs, 0))
        # grow the glyph stream by one byte: sizes say 1 more than the
        # glyph walk consumes
        sizes = list(struct.unpack(">IIIIIII", t[8:36]))
        insert_at = 36 + sizes[0] + sizes[1] + sizes[2] + sizes[3]
        t[insert_at:insert_at] = b"\x00"
        sizes[3] += 1
        t[8:36] = struct.pack(">IIIIIII", *sizes)
        with pytest.raises(ValueError, match="not fully consumed"):
            reconstruct_transformed_glyf(bytes(t))

    def test_truncated_header_and_streams(self):
        t = transform_glyf(_model_glyphs(), 0)
        with pytest.raises(EOFError):
            reconstruct_transformed_glyf(t[:20])
        with pytest.raises(EOFError):
            reconstruct_transformed_glyf(t[:40])


class TestTransformedContainer:
    def _font(self, lf=1, glyphs=None, **kw):
        glyphs = glyphs or _model_glyphs()
        glyf, loca = build_glyf(glyphs, lf)
        head = bytearray(54)
        head[12:16] = struct.pack(">I", 0x5F0F3CF5)
        head[18:20] = struct.pack(">H", 1000)
        head[50:52] = struct.pack(">h", lf)
        tables = [
            (b"head", bytes(head)),
            (b"maxp", struct.pack(">IH", 0x00010000, len(glyphs))
             + b"\x00" * 26),
            (b"hhea", b"\x00" * 34 + struct.pack(">H", len(glyphs))),
            (b"hmtx", bytes(4 * len(glyphs))),
            (b"glyf", glyf),
            (b"loca", loca),
            (b"cmap", bytes(20)),
        ]
        blob = encode_woff2(
            tables,
            transformed={
                b"glyf": transform_glyf(glyphs, lf, explicit_bbox={1}),
                b"loca": b"",
            },
            **kw,
        )
        return blob, tables

    @pytest.mark.parametrize("lf", [0, 1])
    @pytest.mark.parametrize("mode", ["lz", "dict", "literals"])
    def test_census_and_reconstruction(self, lf, mode):
        blob, tables = self._font(lf=lf, br_mode=mode)
        info = parse_woff2(blob, keep_tables=True)
        assert info["glyf_transformed"] is True
        assert info["num_glyphs"] == 5 and info["loca_format"] == lf
        assert info["n_points"] == 13 and info["n_composites"] == 1
        assert info["sfnt_size_ok"] and info["stream_ok"]
        assert info["bytes_walked"] == len(blob)
        # the de-transformed tables equal the originals byte-for-byte
        assert dict(info["table_bytes"]) == dict(tables)

    def test_null_transform_census_unchanged(self):
        blob, tables = self._font()
        null_blob = encode_woff2(tables)
        info = parse_woff2(null_blob)
        assert info["glyf_transformed"] is False
        assert info["n_points"] is None
        assert info["num_glyphs"] == 5

    def test_glyf_origlength_mismatch_rejected(self):
        glyphs = _model_glyphs()
        glyf, loca = build_glyf(glyphs, 1)
        blob, tables = self._font()
        # lie about glyf's origLength: swap in a longer raw glyf
        bad_tables = [(t, b + b"\x00\x00" if t == b"glyf" else b)
                      for t, b in tables]
        bad = encode_woff2(
            bad_tables,
            transformed={b"glyf": transform_glyf(glyphs, 1,
                                                 explicit_bbox={1}),
                         b"loca": b""},
        )
        with pytest.raises(ValueError, match="origLength"):
            parse_woff2(bad)

    def test_head_loca_format_mismatch_rejected(self):
        glyphs = _model_glyphs()
        blob, tables = self._font(lf=1)
        # head says 0, transform says 1
        head = bytearray(dict(tables)[b"head"])
        head[50:52] = struct.pack(">h", 0)
        bad_tables = [(t, bytes(head) if t == b"head" else b)
                      for t, b in tables]
        bad = encode_woff2(
            bad_tables,
            transformed={b"glyf": transform_glyf(glyphs, 1,
                                                 explicit_bbox={1}),
                         b"loca": b""},
        )
        with pytest.raises(ValueError, match="indexToLocFormat"):
            parse_woff2(bad)

    def test_nonzero_transformed_loca_rejected(self):
        with pytest.raises(ValueError, match="transformed loca"):
            encode_woff2(
                [(b"glyf", b"x"), (b"loca", b"\x00\x00")],
                transformed={b"glyf": b"y", b"loca": b"\x01"},
            )


class TestSfntLayer:
    def _sfnt(self):
        blob = TestTransformedContainer()._font()[0]
        info = parse_woff2(blob, keep_tables=True)
        return reconstruct_sfnt(info["table_bytes"])

    def test_verify_clean(self):
        v = verify_sfnt(self._sfnt())
        assert v["search_ok"] and v["checksums_ok"] and v["adjustment_ok"]
        assert v["n_tables"] == 7 and v["flavor"] == "ttf"
        assert v["tags"] == sorted(v["tags"])

    def test_whole_font_checksum_constant(self):
        # with the adjustment in place the whole-font checksum folds
        # to the spec constant 0xB1B0AFBA
        from tectonic_spark.operators.woff2 import _table_checksum

        assert _table_checksum(self._sfnt()) == 0xB1B0AFBA

    def test_tamper_flips_checksums(self):
        font = bytearray(self._sfnt())
        font[-1] ^= 0xFF
        assert verify_sfnt(bytes(font))["checksums_ok"] is False

    def test_tampered_adjustment_detected(self):
        font = bytearray(self._sfnt())
        v0 = verify_sfnt(bytes(font))
        # find head's offset from the directory to corrupt adjustment
        n = struct.unpack(">H", font[4:6])[0]
        for i in range(n):
            tag, _c, off, _l = struct.unpack(
                ">4sIII", font[12 + 16 * i : 28 + 16 * i])
            if tag == b"head":
                font[off + 8] ^= 0x01
        v = verify_sfnt(bytes(font))
        assert v0["adjustment_ok"] is True and v["adjustment_ok"] is False

    def test_unsorted_directory_rejected(self):
        font = bytearray(self._sfnt())
        # swap the first two directory entries
        e0 = bytes(font[12:28])
        e1 = bytes(font[28:44])
        font[12:28], font[28:44] = e1, e0
        with pytest.raises(ValueError, match="sorted"):
            verify_sfnt(bytes(font))

    def test_truncated(self):
        with pytest.raises(EOFError):
            verify_sfnt(self._sfnt()[:10])


class TestWoff1:
    def _tables(self, ng=12, lf=0):
        return [
            (b"head", _head(2048, lf)),
            (b"maxp", struct.pack(">IH", 0x00010000, ng) + b"\x00" * 26),
            (b"hhea", b"\x00" * 34 + struct.pack(">H", ng)),
            (b"hmtx", bytes(4 * ng)),
            (b"glyf", struct.pack(">I", 0xDEADBEEF) * 40),
            (b"loca", bytes((ng + 1) * (2 + 2 * lf))),
            (b"name", b"WOFF1 Test Font " * 3),
            (b"cmap", bytes(20)),
        ]

    def test_round_trip_census(self):
        from tectonic_spark.operators.woff2 import encode_woff1, parse_woff1

        tabs = self._tables()
        blob = encode_woff1(tabs, metadata=b"<meta>x</meta>")
        info = parse_woff1(blob, keep_tables=True)
        assert info["n_tables"] == 8 and info["flavor"] == "ttf"
        assert info["units_per_em"] == 2048 and info["num_glyphs"] == 12
        assert info["sfnt_size_ok"] and info["checksums_ok"]
        assert info["meta_orig_len"] == 14
        assert info["bytes_walked"] == len(blob)
        assert info["n_stored"] == 0  # everything here compresses
        assert dict(info["table_bytes"]) == dict(tabs)

    def test_store_when_bigger_and_forced(self):
        from tectonic_spark.operators.woff2 import encode_woff1, parse_woff1

        # a short table zlib would GROW is stored automatically
        tabs = self._tables()
        tabs.append((b"cvt ", b"\x01\x02"))
        assert parse_woff1(encode_woff1(tabs))["n_stored"] == 1
        # the forced lane stores a compressible table
        blob = encode_woff1(self._tables(), store_tags={b"glyf"})
        info = parse_woff1(blob, keep_tables=True)
        assert info["n_stored"] == 1
        assert dict(info["table_bytes"])[b"glyf"] == dict(
            self._tables())[b"glyf"]

    def test_sfnt_reconstruction_from_woff1(self):
        from tectonic_spark.operators.woff2 import (
            encode_woff1, parse_woff1)

        info = parse_woff1(encode_woff1(self._tables()), keep_tables=True)
        v = verify_sfnt(reconstruct_sfnt(info["table_bytes"]))
        assert v["checksums_ok"] and v["adjustment_ok"] and v["search_ok"]

    def test_checksum_tamper_detected(self):
        from tectonic_spark.operators.woff2 import encode_woff1, parse_woff1

        blob = bytearray(encode_woff1(self._tables()))
        # corrupt one directory origChecksum field (entry 0 bytes 16..20)
        blob[44 + 16] ^= 0x01
        assert parse_woff1(bytes(blob))["checksums_ok"] is False

    def test_taxonomy(self):
        from tectonic_spark.operators.woff2 import encode_woff1, parse_woff1

        blob = encode_woff1(self._tables())
        with pytest.raises(ValueError, match="signature"):
            parse_woff1(b"wOF3" + blob[4:])
        with pytest.raises(EOFError):
            parse_woff1(blob[:40])
        with pytest.raises(ValueError, match="length field"):
            parse_woff1(blob + b"\x00")
        # compLength > origLength is structural
        bad = bytearray(blob)
        bad[44 + 12 : 44 + 16] = struct.pack(">I", 0)  # entry 0 origLength
        with pytest.raises(ValueError, match="compLength"):
            parse_woff1(bytes(bad))
        # corrupt a zlib stream
        bad = bytearray(blob)
        n = struct.unpack(">H", blob[12:14])[0]
        off = struct.unpack(">I", blob[44 + 4 : 44 + 8])[0]
        bad[off] ^= 0xFF
        with pytest.raises(ValueError, match="inflate"):
            parse_woff1(bytes(bad))

"""WOFF2 container tests (operators/woff2.py): round-trips over the
brotli-mode x metadata matrix, the spec arithmetic, UIntBase128 edge
forms, and the error taxonomy (truncation EOFError, structural
ValueError, the glyf/loca transform refusal)."""

from __future__ import annotations

import struct

import pytest

from tectonic_spark.operators.woff2 import (
    _read_base128,
    _write_base128,
    encode_woff2,
    parse_woff2,
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

    def test_transformed_glyf_refused(self):
        # flip glyf's transform version from 3 (null) to 0 (transformed)
        blob = bytearray(encode_woff2(_tables()))
        pos = 48
        # directory entry 2 is glyf (sorted tags: cmap glyf head ...)
        # entry 1 starts after cmap's flags+base128(20)
        assert blob[pos] & 0x3F == 0  # cmap known index
        pos += 2  # flags + 1-byte length (20)
        assert blob[pos] & 0x3F == 10 and blob[pos] >> 6 == 3  # glyf, null
        blob[pos] = 10  # transform version 0 = preprocessed glyf
        with pytest.raises(NotImplementedError, match="glyf/loca"):
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

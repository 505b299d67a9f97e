"""Ogg/Opus container census: page walk + CRC, packet reassembly
across pages, TOC duration accounting, Vorbis identification, error
taxonomy."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.ogg import (
    _ogg_crc,
    encode_ogg_opus,
    opus_packet_samples,
    parse_ogg,
)


def _pk(n, size=60, toc=8):
    return [
        bytes([toc]) + bytes((k * 7 + j) % 256 for j in range(size - 1))
        for k in range(n)
    ]


def test_basic_census():
    data = encode_ogg_opus(_pk(3), channels=2, pre_skip=312)
    info = parse_ogg(data)
    assert info["n_pages"] == 5  # OpusHead + OpusTags + 3 data pages
    assert info["n_streams"] == 1
    assert info["bytes_walked"] == len(data)
    s = info["streams"][0]
    assert s["codec"] == "opus"
    assert s["channels"] == 2 and s["pre_skip"] == 312
    assert s["sample_rate"] == 48000
    assert s["n_packets"] == 5  # 2 headers + 3 data
    assert s["duration_samples"] == 3 * 960
    assert s["toc_duration_samples"] == 3 * 960
    assert s["spanned_packets"] == 0 and s["eos"]


def test_spanning_packet():
    big = bytes([8]) + bytes(599)
    data = encode_ogg_opus(_pk(2) + [big], max_segments_per_page=2)
    info = parse_ogg(data)
    # 2 header + 2 small + 2 pages for the 600-byte packet
    assert info["n_pages"] == 6
    s = info["streams"][0]
    assert s["spanned_packets"] == 1
    assert s["n_packets"] == 5
    assert s["duration_samples"] == s["toc_duration_samples"] == 3 * 960


def test_exact_255_multiple_lacing():
    # packet of exactly 510 bytes needs a terminating 0 lacing value
    pk = bytes([8]) + bytes(509)
    data = encode_ogg_opus([pk])
    s = parse_ogg(data)["streams"][0]
    assert s["n_packets"] == 3
    assert s["duration_samples"] == 960


@pytest.mark.parametrize(
    "toc,expect",
    [
        (0 << 3, 480),  # SILK NB 10 ms
        (1 << 3, 960),  # SILK NB 20 ms
        (3 << 3, 2880),  # SILK NB 60 ms
        (12 << 3, 480),  # hybrid SWB 10 ms
        (16 << 3, 120),  # CELT NB 2.5 ms
        (31 << 3, 960),  # CELT FB 20 ms
        ((1 << 3) | 1, 1920),  # code 1: two frames
        ((1 << 3) | 2, 1920),  # code 2: two frames
    ],
)
def test_toc_durations(toc, expect):
    assert opus_packet_samples(bytes([toc, 0x05]) + b"x") == expect


def test_toc_code3():
    # code 3: frame count in the next byte's low 6 bits
    assert opus_packet_samples(bytes([(1 << 3) | 3, 5])) == 5 * 960
    with pytest.raises(ValueError, match="frame count"):
        opus_packet_samples(bytes([(1 << 3) | 3, 0x40]))
    with pytest.raises(EOFError):
        opus_packet_samples(bytes([(1 << 3) | 3]))


def test_vorbis_identification():
    # hand-build a minimal Vorbis BOS page via the Opus writer's page
    # machinery: swap the first packet for a Vorbis ID header
    vid = (
        b"\x01vorbis"
        + struct.pack("<IBI", 0, 2, 44100)
        + struct.pack("<iii", 0, 128000, 0)
        + bytes([0xB8, 0x01])
    )
    data = encode_ogg_opus([bytes([8]) + b"x"])
    # rebuild page 0 with the vorbis payload
    info = parse_ogg(data)
    assert info["streams"][0]["codec"] == "opus"
    from tectonic_spark.operators.ogg import _CAPTURE

    head = (
        _CAPTURE
        + struct.pack("<BBqIIIB", 0, 0x02, 0, 9, 0, 0, 1)
        + bytes([len(vid)])
        + vid
    )
    crc = _ogg_crc(head)
    page0 = head[:22] + struct.pack("<I", crc) + head[26:]
    got = parse_ogg(page0)
    s = got["streams"][0]
    assert s["codec"] == "vorbis"
    assert s["channels"] == 2 and s["sample_rate"] == 44100


def test_error_taxonomy():
    data = encode_ogg_opus(_pk(2))
    with pytest.raises(ValueError, match="capture pattern"):
        parse_ogg(b"Nope" + data[4:])
    with pytest.raises(EOFError):
        parse_ogg(data[: len(data) - 3])
    # flip a payload byte: CRC mismatch
    bad = bytearray(data)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_ogg(bytes(bad))
    # first page without BOS: header(27) + lacing(n_segs) + body
    n_segs = data[26]
    first_len = 27 + n_segs + sum(data[27 : 27 + n_segs])
    raw = bytearray(data[:first_len])
    raw[5] = 0
    raw[22:26] = b"\x00\x00\x00\x00"
    crc = _ogg_crc(bytes(raw))
    raw[22:26] = struct.pack("<I", crc)
    with pytest.raises(ValueError, match="BOS"):
        parse_ogg(bytes(raw) + data[first_len:])


def test_crc_polynomial_pin():
    # the generated table must implement the RFC 3533 polynomial:
    # CRC of a single zero byte is 0, of 0x80<<24-aligned... pin two
    # closed-form values derivable by hand from the polynomial
    assert _ogg_crc(b"\x00") == 0
    assert _ogg_crc(b"\x01") == 0x04C11DB7


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 6),
    size=st.integers(2, 700),
    maxseg=st.integers(1, 255),
    ch=st.integers(1, 2),
    toc_cfg=st.integers(0, 31),
)
def test_property_roundtrip(n, size, maxseg, ch, toc_cfg):
    toc = toc_cfg << 3
    pks = [
        bytes([toc]) + bytes((k + j) % 256 for j in range(size - 1))
        for k in range(n)
    ]
    info = parse_ogg(
        encode_ogg_opus(pks, channels=ch, max_segments_per_page=maxseg)
    )
    s = info["streams"][0]
    assert s["n_packets"] == n + 2
    assert s["channels"] == ch
    per = opus_packet_samples(pks[0])
    assert s["duration_samples"] == n * per
    assert s["toc_duration_samples"] == n * per
    assert s["eos"]
    assert info["bytes_walked"] > 0

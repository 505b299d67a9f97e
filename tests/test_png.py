"""PNG codec: lossless round-trips across the full type/depth/filter
matrix, wavefront-vs-row-tier equality, Adam7, error taxonomy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.png import (
    _SIG,
    decode_png,
    encode_png,
    parse_png,
)


def _img(h, w, c=None, seed=0, depth=8):
    rng = np.random.default_rng(seed)
    hi = (1 << depth) - 1
    shape = (h, w) if c is None else (h, w, c)
    dt = np.uint16 if depth == 16 else np.uint8
    return rng.integers(0, hi + 1, shape, dtype=dt)


@pytest.mark.parametrize("c", [None, 2, 3, 4])
@pytest.mark.parametrize("depth", [8, 16])
@pytest.mark.parametrize("filters", [0, 1, 2, 3, 4, None])
def test_roundtrip_matrix(c, depth, filters):
    img = _img(13, 9, c, seed=depth * 10 + (filters or 7), depth=depth)
    px = decode_png(encode_png(img, filters=filters))
    assert px.dtype == img.dtype and px.shape == img.shape
    assert (px == img).all()


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_roundtrip(depth):
    n = 1 << depth
    pal = _img(n, 3, seed=depth).reshape(n, 3).astype(np.uint8)
    idx = _img(11, 17, seed=depth + 50, depth=depth)
    px = decode_png(encode_png(idx, bit_depth=depth, palette=pal))
    assert (px == pal[idx]).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_roundtrip(depth):
    img = _img(9, 23, seed=depth, depth=depth)
    px = decode_png(encode_png(img, bit_depth=depth))
    assert (px == img).all()


def test_wavefront_equals_row_tier():
    """The same pixels encoded with row-tier-only filters and with
    Paeth/Average must decode identically — cross-checks the two
    unfilter engines against each other."""
    img = _img(40, 33, 3, seed=3)
    stats_a, stats_b = {}, {}
    a = decode_png(encode_png(img, filters=[r % 3 for r in range(40)]), _stats=stats_a)
    b = decode_png(encode_png(img, filters=[3 + r % 2 for r in range(40)]), _stats=stats_b)
    assert not stats_a["wavefront"] and stats_b["wavefront"]
    assert (a == b).all() and (a == img).all()


@pytest.mark.parametrize("c", [None, 3, 4])
@pytest.mark.parametrize("depth", [8, 16])
def test_adam7_roundtrip(c, depth):
    img = _img(21, 10, c, seed=depth, depth=depth)
    data = encode_png(img, interlace=True)
    assert parse_png(data)["interlace"] == 1
    assert (decode_png(data) == img).all()


def test_adam7_small_images_skip_empty_passes():
    for h, w in [(1, 1), (2, 3), (5, 1), (1, 9), (8, 8)]:
        img = _img(h, w, 3, seed=h * 10 + w)
        assert (decode_png(encode_png(img, interlace=True)) == img).all()


def test_tiny_and_odd_sizes():
    for h, w in [(1, 1), (1, 7), (7, 1), (3, 2)]:
        img = _img(h, w, seed=h + w)
        assert (decode_png(encode_png(img)) == img).all()


def test_multi_idat_and_ancillary_chunks():
    img = _img(8, 8, 3, seed=9)
    data = encode_png(img)
    # split the IDAT into two and insert a tEXt chunk before it
    pos = data.index(b"IDAT") - 4
    (ln,) = struct.unpack_from(">I", data, pos)
    payload = data[pos + 8 : pos + 8 + ln]
    head, tail = data[:pos], data[pos + 12 + ln :]

    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(">I", zlib.crc32(t + p))

    rebuilt = (
        head
        + chunk(b"tEXt", b"k\x00v")
        + chunk(b"IDAT", payload[:5])
        + chunk(b"IDAT", payload[5:])
        + tail
    )
    assert (decode_png(rebuilt) == img).all()
    assert parse_png(rebuilt)["n_chunks"] == 5


def test_error_taxonomy():
    img = _img(6, 6, seed=1)
    good = encode_png(img)
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"JUNK" + good[4:])
    # corrupt a byte inside the IDAT payload -> CRC mismatch
    pos = good.index(b"IDAT") + 6
    bad = bytearray(good)
    bad[pos] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))
    with pytest.raises(EOFError):
        decode_png(good[: len(good) - 7])
    # bad filter type: rebuild with filter byte 7 on row 0
    rb = 6
    ipos = good.index(b"IDAT")
    (iln,) = struct.unpack_from(">I", good, ipos - 4)
    raw = bytearray(zlib.decompress(good[ipos + 4 : ipos + 4 + iln]))
    raw[0] = 7
    head = good[: ipos - 4]

    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(">I", zlib.crc32(t + p))

    rebuilt = head + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="invalid PNG filter type"):
        decode_png(rebuilt)
    # short pixel data
    rebuilt = head + chunk(b"IDAT", zlib.compress(bytes(raw[: 3 * (rb + 1)]))) + chunk(
        b"IEND", b""
    )
    with pytest.raises(EOFError, match="pixel data exhausted"):
        decode_png(rebuilt)
    # trailing garbage
    rebuilt = head + chunk(
        b"IDAT", zlib.compress(bytes(raw) + b"\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="trailing garbage"):
        decode_png(rebuilt)
    # inflate error
    rebuilt = head + chunk(b"IDAT", b"\x00not-zlib") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflate error"):
        decode_png(rebuilt)


def test_palette_index_out_of_range():
    # encode-time guard (r10, ADVICE): a fixture bug surfaces at
    # generation time, not later on an executor
    pal = np.zeros((2, 3), dtype=np.uint8)
    idx = np.array([[0, 1], [1, 3]], dtype=np.uint8)  # 3 >= len(pal)
    with pytest.raises(ValueError, match="frame index exceeds palette"):
        encode_png(idx, bit_depth=8, palette=pal)
    # decode-time guard still fires for third-party payloads: write a
    # valid 4-entry-palette PNG, then shrink PLTE to 2 entries
    pal4 = np.arange(12, dtype=np.uint8).reshape(4, 3)
    data = encode_png(idx, bit_depth=8, palette=pal4)
    ppos = data.index(b"PLTE")
    head, tail = data[: ppos - 4], data[ppos + 4 + 12 + 4 :]
    short = pal4[:2].tobytes()
    shrunk = (
        head
        + struct.pack(">I", len(short))
        + b"PLTE"
        + short
        + struct.pack(">I", zlib.crc32(b"PLTE" + short))
        + tail
    )
    with pytest.raises(ValueError, match="palette index out of range"):
        decode_png(shrunk)


def test_parse_png_census():
    img = _img(12, 5, 3, seed=4)
    meta = parse_png(encode_png(img))
    assert meta["width"] == 5 and meta["height"] == 12
    assert meta["bit_depth"] == 8 and meta["color_type"] == 2
    assert meta["n_chunks"] == 3 and meta["idat_bytes"] > 0


def test_filter_stats_pin():
    img = _img(10, 4, seed=2)
    stats = {}
    decode_png(encode_png(img, filters=None), _stats=stats)  # cycle 0..4
    assert stats["filter_rows"] == [2, 2, 2, 2, 2]
    assert stats["wavefront"]


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([None, 2, 3, 4]),
    depth=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**16),
    mode=st.sampled_from(["cycle", "fixed4", "interlace"]),
)
def test_property_roundtrip(h, w, c, depth, seed, mode):
    img = _img(h, w, c, seed=seed, depth=depth)
    if mode == "interlace":
        data = encode_png(img, interlace=True)
    else:
        data = encode_png(img, filters=4 if mode == "fixed4" else None)
    assert (decode_png(data) == img).all()


# ------------------------------------------------------- batch lane pool


def _cycle_png(d, h=64, w=48, c=3):
    img = _img(h, w, c, seed=d)
    return img, encode_png(img, filters=None)


def test_batch_equals_scalar_mixed_corpus(monkeypatch):
    import tectonic_spark.operators.png as png

    monkeypatch.setattr(png, "MIN_PNG_POOL_LANES", 1)
    imgs, payloads = [], []
    # heterogeneous shapes, depths, color types, filter styles
    specs = [
        (None, 8, 0, 13, 9),
        (3, 8, 1, 20, 17),
        (4, 8, 2, 8, 8),
        (None, 16, 3, 11, 5),
        (2, 8, 4, 9, 31),   # row-tier only
        ([3] * 7, 8, 5, 7, 7),
        (4, 16, 6, 6, 20),
    ]
    for filt, depth, seed, h, w in specs:
        for c in (None, 3):
            img = _img(h, w, c, seed=seed, depth=depth)
            imgs.append(img)
            payloads.append(encode_png(img, filters=filt))
    # plus an interlaced payload (per-image fallback inside the batch)
    img = _img(10, 10, 3, seed=77)
    imgs.append(img)
    payloads.append(encode_png(img, interlace=True))
    stats: list = []
    got = png.decode_png_batch(payloads, stats_out=stats)
    assert len(got) == len(imgs) == len(stats)
    for g, ref, p in zip(got, imgs, payloads):
        assert g.dtype == ref.dtype and g.shape == ref.shape
        assert (g == ref).all()
        assert (g == decode_png(p)).all()


def test_batch_pool_gate_and_pin():
    import tectonic_spark.operators.png as png

    # the m17 fixture shape: 512 rows cycling filters -> ~102 wavefront
    # segments from ONE payload, above the production gate on its own
    bi = np.arange(4096, dtype=np.int64)
    vals = ((9 * 13 + bi * 19) % 256).astype(np.uint8).reshape(64, 64)
    plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    data = encode_png(plane, filters=None)
    assert png.payload_rides_png_pool(data)
    stats: list = []
    (px,) = png.decode_png_batch([data], stats_out=stats)
    assert stats[0]["pooled"] and stats[0]["wavefront"]
    assert (px == plane).all()
    # a small all-Paeth image alone stays under the gate (one lane)
    small = encode_png(_img(16, 16, seed=3), filters=4)
    assert not png.payload_rides_png_pool(small)
    stats2: list = []
    png.decode_png_batch([small], stats_out=stats2)
    assert stats2[0]["wavefront"] and not stats2[0]["pooled"]


def test_batch_pool_cap_splits(monkeypatch):
    import tectonic_spark.operators.png as png

    monkeypatch.setattr(png, "MIN_PNG_POOL_LANES", 1)
    imgs, payloads = [], []
    for s in range(6):
        img = _img(24, 24, 3, seed=s)
        imgs.append(img)
        payloads.append(encode_png(img, filters=4))
    big = png.decode_png_batch(payloads)
    runs = []
    orig = png._run_wave_pool

    def counting(lanes):
        runs.append(len(lanes))
        return orig(lanes)

    monkeypatch.setattr(png, "_run_wave_pool", counting)
    monkeypatch.setattr(png, "PNG_POOL_BYTE_CAP", 25 * 25 * 3 * 2)
    capped = png.decode_png_batch(payloads)
    assert len(runs) >= 3  # the cap forced multiple sequential pools
    for a, b, ref in zip(big, capped, imgs):
        assert (a == b).all() and (a == ref).all()


def test_batch_error_parity():
    import tectonic_spark.operators.png as png

    good = encode_png(_img(6, 6, seed=1), filters=4)
    bad = bytearray(good)
    bad[good.index(b"IDAT") + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        png.decode_png_batch([good, bytes(bad)])
    with pytest.raises(EOFError):
        png.decode_png_batch([good[: len(good) - 7]])


@settings(max_examples=30, deadline=None)
@given(
    hs=st.lists(st.integers(1, 10), min_size=1, max_size=5),
    c=st.sampled_from([None, 3]),
    seed=st.integers(0, 2**16),
    fmode=st.sampled_from([None, 3, 4, 2]),
)
def test_property_batch_equals_scalar(hs, c, seed, fmode):
    import tectonic_spark.operators.png as png

    old = png.MIN_PNG_POOL_LANES
    png.MIN_PNG_POOL_LANES = 1
    try:
        imgs = [
            _img(h, 3 + (seed + k) % 9, c, seed=seed + k)
            for k, h in enumerate(hs)
        ]
        payloads = [encode_png(im, filters=fmode) for im in imgs]
        got = png.decode_png_batch(payloads)
        for g, ref in zip(got, imgs):
            assert (g == ref).all()
    finally:
        png.MIN_PNG_POOL_LANES = old

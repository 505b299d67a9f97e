"""TIFF codec: lossless round-trips across compression/predictor/
photometric/byte-order/strip matrices, error taxonomy, census."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators.tiff import (
    _COMP_LZW,
    _COMP_NONE,
    _COMP_PACKBITS,
    decode_tiff,
    encode_tiff,
    parse_tiff,
)


def _img(h, w, c=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("comp", [_COMP_NONE, _COMP_LZW, _COMP_PACKBITS])
@pytest.mark.parametrize("c", [None, 3])
@pytest.mark.parametrize("be", [False, True])
def test_roundtrip_matrix(comp, c, be):
    img = _img(21, 13, c, seed=comp + (3 if c else 0))
    got = decode_tiff(encode_tiff(img, compression=comp, big_endian=be))
    assert got.shape == img.shape and (got == img).all()


@pytest.mark.parametrize("comp", [_COMP_LZW, _COMP_NONE])
@pytest.mark.parametrize("c", [None, 3])
def test_predictor_roundtrip(comp, c):
    # smooth gradients are where predictor 2 actually changes the bytes
    h, w = 20, 30
    base = (np.arange(w)[None, :] * 3 + np.arange(h)[:, None]) % 256
    img = base.astype(np.uint8)
    if c:
        img = np.stack([img, img // 2, 255 - img], axis=2).astype(np.uint8)
    data = encode_tiff(img, compression=comp, predictor=2)
    assert parse_tiff(data)["predictor"] == 2
    assert (decode_tiff(data) == img).all()


def test_multi_strip_and_single_strip():
    img = _img(50, 9, seed=5)
    multi = encode_tiff(img, compression=_COMP_LZW, rows_per_strip=7)
    single = encode_tiff(img, compression=_COMP_LZW, rows_per_strip=64)
    assert parse_tiff(multi)["n_strips"] == 8
    assert parse_tiff(single)["n_strips"] == 1
    assert (decode_tiff(multi) == img).all()
    assert (decode_tiff(single) == img).all()


def test_palette_roundtrip():
    pal = _img(16, 3, seed=7).reshape(16, 3)
    idx = (_img(11, 8, seed=8) % 16).astype(np.uint8)
    data = encode_tiff(idx, compression=_COMP_PACKBITS, palette=pal)
    meta = parse_tiff(data)
    assert meta["photometric"] == 3
    assert (decode_tiff(data) == pal[idx]).all()


def test_lzw_dictionary_reset():
    # enough noise bytes to exceed 4094 dictionary entries
    img = _img(80, 80, seed=9)
    data = encode_tiff(img, compression=_COMP_LZW, rows_per_strip=80)
    assert (decode_tiff(data) == img).all()


def test_error_taxonomy():
    img = _img(8, 8, seed=1)
    good = encode_tiff(img, compression=_COMP_LZW)
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="bad magic"):
        decode_tiff(good[:2] + b"\x00\x00" + good[4:])
    with pytest.raises(EOFError):
        decode_tiff(good[:20])
    # truncated strip
    with pytest.raises(EOFError):
        decode_tiff(good[: len(good) - 4])


def test_census():
    img = _img(12, 34, 3, seed=3)
    meta = parse_tiff(encode_tiff(img, compression=_COMP_PACKBITS))
    assert meta["width"] == 34 and meta["height"] == 12
    assert meta["compression"] == _COMP_PACKBITS
    assert meta["photometric"] == 2 and meta["n_pages"] == 1
    assert meta["byte_order"] == "II"


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([None, 3]),
    comp=st.sampled_from([_COMP_NONE, _COMP_LZW, _COMP_PACKBITS]),
    pred=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**16),
    structured=st.booleans(),
)
def test_property_roundtrip(h, w, c, comp, pred, seed, structured):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    if structured:
        img = (
            (np.indices(shape).sum(axis=0) * (seed % 7 + 1)) % 256
        ).astype(np.uint8)
    else:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
    data = encode_tiff(
        img, compression=comp, predictor=pred, rows_per_strip=5
    )
    assert (decode_tiff(data) == img).all()


def test_real_world_tiff_decodes():
    """Interop ground truth: the RGBA TIFF shipped with CPython's test
    suite (written by a real third-party encoder) must parse and
    decode."""
    import glob
    import os

    cands = []
    for pat in ("test/test_email/data/python.tiff", "test/imghdrdata/python.tiff"):
        cands += glob.glob(os.path.join(os.path.dirname(os.__file__), pat))
    if not cands:
        pytest.skip("no CPython test TIFF on this host")
    data = open(cands[0], "rb").read()
    meta = parse_tiff(data)
    assert meta["width"] == 16 and meta["height"] == 16
    px = decode_tiff(data)
    assert px.shape == (16, 16, 4) and px.dtype == np.uint8


def _strict_lzw_read(stream: bytes, n_out: int) -> None:
    """Spec-strict MSB-first TIFF LZW reader: decodes exactly n_out
    bytes doing full width bookkeeping, then REQUIRES the very next
    code (at the post-growth width) to be EOI — the conformance
    property third-party readers rely on and the r10 encoder fix
    guarantees."""
    CLEAR, EOI = 256, 257
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    width, size = 9, 258
    prev = None
    buf = nbits = pos = 0
    out = bytearray()

    def read_code():
        nonlocal buf, nbits, pos
        while nbits < width:
            buf = (buf << 8) | stream[pos]
            pos += 1
            nbits += 8
        nbits -= width
        return (buf >> nbits) & ((1 << width) - 1)

    while True:
        code = read_code()
        if code == CLEAR:
            del table[258:]
            width, size, prev = 9, 258, None
            continue
        assert code != EOI or len(out) == n_out
        if code == EOI:
            return
        cur = prev + prev[:1] if code == size else table[code]
        out += cur
        if prev is not None:
            table.append(prev + cur[:1])
            size += 1
            if size == (1 << width) - 1 and width < 12:
                width += 1
        prev = cur


@pytest.mark.parametrize("n", [252, 253, 254, 255, 256, 508, 509, 510])
def test_lzw_encoder_eoi_width_conformance(n):
    """r10 ADVICE fix: when the final data code lands exactly on the
    early-change boundary (n=254 incompressible bytes -> decoder size
    hits 511 on its last entry add), EOI must be emitted at the
    POST-growth width or a strict reader sees a garbage code."""
    from tectonic_spark.operators.tiff import _lzw_decode_tiff, _lzw_encode_tiff

    data = bytes(range(256))[:n] if n <= 256 else bytes(
        (i * 3) % 256 for i in range(n)
    )
    enc = _lzw_encode_tiff(data)
    _strict_lzw_read(enc, len(data))  # strict reader sees EOI cleanly
    assert _lzw_decode_tiff(enc, len(data)) == data  # pixels unchanged

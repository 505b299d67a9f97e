"""Vendored baseline-JPEG codec (tectonic_spark/operators/jpeg.py, r5).

The correctness story has three independent legs:

1. **Closed-form DCT reference** (this file's ``_reference_decode``): an
   independent re-implementation of the lossy pipeline (color convert →
   subsample → pad → FDCT → quant → dequant → IDCT → upsample → color
   convert) that never touches the entropy layer. ``decode(encode(img))``
   must match it BIT-EXACTLY for arbitrary images — any huffman/bitstream
   /marker bug shows up as a pixel diff.
2. **Exact-roundtrip fixtures**: images constant per 8x8 block at even
   gray levels quantize invertibly (q00=16 | 8*(v-128)) — decode must
   return the ORIGINAL pixels. This is the m08 oracle construction.
3. **Golden bytes**: pinned sha256 of encoder output for fixed inputs —
   the bitstream layout cannot drift silently.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from tectonic_spark.operators.jpeg import (
    STD_QT_CHROMA,
    STD_QT_LUMA,
    decode_jpeg,
    encode_jpeg,
    quality_scaled,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _iround(x):
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


def _dct_mat():
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_M = _dct_mat()


def _roundtrip_plane(plane: np.ndarray, qt: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """FDCT→quant→dequant→IDCT every 8x8 block of an edge-padded plane."""
    p = np.pad(
        plane.astype(float),
        ((0, bh - plane.shape[0]), (0, bw - plane.shape[1])),
        mode="edge",
    )
    out = np.zeros_like(p)
    q = qt.reshape(8, 8).astype(float)
    for y in range(0, bh, 8):
        for x in range(0, bw, 8):
            coef = _iround(_M @ (p[y : y + 8, x : x + 8] - 128.0) @ _M.T / q)
            rec = _M.T @ (coef * q) @ _M
            out[y : y + 8, x : x + 8] = np.clip(_iround(rec + 128.0), 0, 255)
    return out


def _reference_decode(img: np.ndarray, quality: int = 50, sub: str = "444") -> np.ndarray:
    """Expected decode(encode(img)) without any entropy coding."""
    qt_l = quality_scaled(STD_QT_LUMA, quality)
    qt_c = quality_scaled(STD_QT_CHROMA, quality)
    if img.ndim == 2:
        h, w = img.shape
        return _roundtrip_plane(img, qt_l, (h + 7) // 8 * 8, (w + 7) // 8 * 8)[
            :h, :w
        ].astype(np.uint8)
    h, w, _ = img.shape
    ycc = rgb_to_ycbcr(img)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if sub == "420":
        eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        pads = [(0, eh - h), (0, ew - w)]
        ye, cbe, cre = (np.pad(p, pads, mode="edge") for p in (y, cb, cr))

        def down(p):
            s = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
            return _iround(s.mean(axis=(1, 3)))

        planes = [y, down(cbe), down(cre)]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        planes = [y, cb, cr]
        samp = [(1, 1), (1, 1), (1, 1)]
    h_max = max(s[0] for s in samp)
    v_max = max(s[1] for s in samp)
    mcx = (w + 8 * h_max - 1) // (8 * h_max)
    mcy = (h + 8 * v_max - 1) // (8 * v_max)
    outp = []
    for p, (sh, sv), qt in zip(planes, samp, [qt_l, qt_c, qt_c]):
        o = _roundtrip_plane(p, qt, mcy * 8 * sv, mcx * 8 * sh)
        o = np.repeat(np.repeat(o, v_max // sv, axis=0), h_max // sh, axis=1)
        outp.append(o[:h, :w])
    return ycbcr_to_rgb(np.stack(outp, axis=-1)).astype(np.uint8)


# ------------------------------------------------------- leg 1: reference


@pytest.mark.parametrize("dims", [(8, 8), (16, 24), (17, 13), (40, 31), (9, 65)])
def test_gray_matches_reference(dims):
    rng = np.random.RandomState(sum(dims))
    img = rng.randint(0, 256, dims, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(out, _reference_decode(img)), dims


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("dims", [(16, 16), (24, 18), (19, 13), (33, 47)])
def test_color_matches_reference(dims, sub):
    rng = np.random.RandomState(sum(dims) * 3)
    img = rng.randint(0, 256, dims + (3,), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling=sub))
    assert out.shape == img.shape
    assert np.array_equal(out, _reference_decode(img, sub=sub)), (dims, sub)


@pytest.mark.parametrize("quality", [10, 35, 50, 75, 92])
def test_quality_sweep_matches_reference(quality):
    rng = np.random.RandomState(quality)
    img = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert np.array_equal(out, _reference_decode(img, quality=quality))


@pytest.mark.parametrize("ri", [1, 2, 5])
def test_restart_markers_match_reference(ri):
    """DRI/RSTn path: same pixels as the unrestarted stream, and the
    stream actually contains RST markers."""
    rng = np.random.RandomState(ri)
    img = rng.randint(0, 256, (32, 40, 3), dtype=np.uint8)
    data = encode_jpeg(img, subsampling="420", restart_interval=ri)
    assert any(
        data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7 for i in range(2, len(data) - 3)
    )
    assert np.array_equal(decode_jpeg(data), _reference_decode(img, sub="420"))


def test_gradient_image_422_style_dims():
    """Smooth gradient (small AC coefficients, long zero runs → EOB-heavy
    bitstream) across a non-square image."""
    y, x = np.mgrid[0:24, 0:56]
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.array_equal(out, _reference_decode(img, quality=75))


# --------------------------------------------- leg 2: exact roundtrips


def test_flat_even_blocks_roundtrip_exact_gray():
    blocks = (2 * ((np.arange(20) * 37 + 5) % 128)).reshape(4, 5)
    img = np.kron(blocks, np.ones((8, 8), dtype=int)).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_flat_even_blocks_roundtrip_exact_color(sub):
    """The m08 oracle construction: R=G=B=v (even) per 8x8 block → Y=v,
    Cb=Cr=128, only DC survives, q00 divides it → exact decode."""
    blocks = (2 * ((np.arange(12) * 13 + 7) % 128)).reshape(3, 4)
    plane = np.kron(blocks, np.ones((8, 8), dtype=int)).astype(np.uint8)
    img = np.repeat(plane[:, :, None], 3, axis=2)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, subsampling=sub)), img)


def test_odd_gray_levels_are_lossy():
    """Sanity check the exactness argument: ODD offsets from 128 cannot
    round-trip (8Δ not divisible by q00=16) — the codec must actually be
    doing lossy DCT quantization, not memcpy."""
    img = np.full((8, 8), 129, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert not np.array_equal(out, img)
    assert np.abs(out.astype(int) - 129).max() <= 2


# ------------------------------------------------- leg 3: golden bytes


def test_golden_color_bytes():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (21, 26, 3), dtype=np.uint8)
    b = encode_jpeg(img, quality=50, subsampling="420", restart_interval=2)
    assert len(b) == 982
    assert (
        hashlib.sha256(b).hexdigest()
        == "43fd8a20cbb23bc8dc4b92cc906e0e2bc7a8fcae8f3b795663f39936734f6b76"
    )
    g = rng.randint(0, 256, (15, 9), dtype=np.uint8)
    bg = encode_jpeg(g, quality=85)
    assert len(bg) == 451
    assert (
        hashlib.sha256(bg).hexdigest()
        == "82ca5f903175852a7d51b6165ca4df097d334f1e7547910368b263a9b5a92a4b"
    )


# ------------------------------------------------------ format handling


def test_16bit_quant_table_segment():
    """Decoder must accept precision-1 (16-bit) DQT segments: re-write the
    encoder's 8-bit table as 16-bit and expect identical pixels."""
    img = np.full((8, 8), 130, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xdb")
    # original: len=67, pq/tq=0x00, 64 bytes zigzag
    zz = data[i + 5 : i + 5 + 64]
    wide = struct.pack(">H", 131) + b"\x10" + b"".join(
        struct.pack(">H", v) for v in zz
    )
    patched = bytes(data[: i + 2]) + wide + bytes(data[i + 5 + 64 :])
    assert np.array_equal(decode_jpeg(patched), decode_jpeg(bytes(data)))


def test_progressive_raises():
    img = np.full((8, 8), 130, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(data))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"BMnotajpeg")


def test_truncated_raises():
    img = np.full((16, 16), 130, dtype=np.uint8)
    data = encode_jpeg(img)
    with pytest.raises((ValueError, EOFError, struct.error)):
        decode_jpeg(data[:40])


def test_app_and_comment_segments_skipped():
    """APPn/COM segments between SOI and SOF must be walked over."""
    img = np.full((8, 8), 130, dtype=np.uint8)
    data = encode_jpeg(img)
    com = b"\xff\xfe" + struct.pack(">H", 2 + 11) + b"hello jpeg!"
    app9 = b"\xff\xe9" + struct.pack(">H", 2 + 4) + b"\x01\x02\x03\x04"
    patched = data[:2] + com + app9 + data[2:]
    assert np.array_equal(decode_jpeg(patched), img)


# -------------------------------------------- m08 fixture construction


def test_m08_payload_decodes_to_block_values():
    from tectonic_spark.operators.multimodal import (
        _jpeg_block_value,
        _jpeg_fixture_params,
        _jpeg_payload,
    )

    for doc_id in (0, 3, 6, 9, 12, 21, 42, 63):
        w, h, mode, _ri = _jpeg_fixture_params(doc_id)
        px = decode_jpeg(_jpeg_payload(doc_id))
        if mode == "gray":
            assert px.shape == (h, w)
        else:
            assert px.shape == (h, w, 3)
        bw = w // 8
        expected = sum(
            64 * _jpeg_block_value(doc_id, bi) for bi in range((h // 8) * bw)
        ) * (1 if mode == "gray" else 3)
        assert int(px.astype(np.int64).sum()) == expected, doc_id

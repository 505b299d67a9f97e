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


def test_lossless_sof3_raises():
    # progressive (SOF2) decodes natively since r6; lossless still raises
    img = np.full((8, 8), 130, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # SOF0 → SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="SOF"):
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


# ----------------------------------------------------- progressive (r6)


class TestProgressive:
    def test_progressive_equals_baseline_decode(self):
        import numpy as np

        from tectonic_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(5)
        cases = [
            ((24, 40), {}),
            ((24, 40, 3), {"subsampling": "444"}),
            ((21, 37, 3), {"subsampling": "420"}),
            ((8, 8), {}),
            ((50, 50, 3), {"subsampling": "420"}),
        ]
        for shape, kw in cases:
            img = rng.integers(0, 256, shape).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img, quality=75, **kw))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=75, **kw))
            assert (base == prog).all(), (shape, kw)

    def test_progressive_band_split_variants(self):
        import numpy as np

        from tectonic_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=60, subsampling="444"))
        for bands in [((1, 63),), ((1, 2), (3, 9), (10, 63))]:
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=60, subsampling="444", bands=bands)
            )
            assert (base == prog).all(), bands

    def test_successive_approximation_hand_built(self):
        import struct

        import numpy as np

        from tectonic_spark.operators.jpeg import (
            ZIGZAG,
            _A,
            _AT,
            _BitWriter,
            _round_clip_u8,
            decode_jpeg,
        )

        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + b"\x01" * 64
        out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += struct.pack("BBB", 1, 0x11, 0)

        def dht(tid, bits, vals):
            return (
                b"\xff\xc4"
                + struct.pack(">HB", 19 + len(vals), tid)
                + bytes(bits)
                + bytes(vals)
            )

        def sos(ss, se, ah, al):
            return (
                b"\xff\xda"
                + struct.pack(">HB", 8, 1)
                + bytes([1, 0x00, ss, se, (ah << 4) | al])
            )

        # --- scan 1: DC first (ah=0, al=1): diff 5 -> coef0 = 10
        out += dht(0x00, [1] + [0] * 15, [3])  # size-3 at code '0'
        out += sos(0, 0, 0, 1)
        w = _BitWriter()
        w.write(0, 1)
        w.write(0b101, 3)  # +5
        w.flush()
        out += w.buf
        # --- scan 2: AC first (al=1): +2 at k=2, -1<<1=-2 at k=5, EOB0
        # table: 0x12 -> '00', 0x21 -> '01', 0x00 -> '10'
        out += dht(0x10, [0, 3] + [0] * 14, [0x12, 0x21, 0x00])
        out += sos(1, 63, 0, 1)
        w = _BitWriter()
        w.write(0b00, 2)  # sym 0x12: run 1, size 2
        w.write(0b10, 2)  # magnitude bits of +2 (raw value before <<al)
        w.write(0b01, 2)  # sym 0x21: run 2, size 1
        w.write(0b0, 1)  # magnitude bits of -1
        w.write(0b10, 2)  # EOB0
        w.flush()
        out += w.buf
        # after scan 2 (values <<1): k2 = 2<<1=4, k5 = -1<<1=-2
        # --- scan 3: DC refine (ah=1, al=0): bit 1 -> coef0 = 11
        out += sos(0, 0, 1, 0)
        w = _BitWriter()
        w.write(1, 1)
        w.flush()
        out += w.buf
        # --- scan 4: AC refine (ah=2? encoded as ah=2,al=1): insert +2 at
        # k=1 (sym 0x01 + sign 1), then EOB1 with extra bit 0 (eobrun=2),
        # correction bits: k2 (4 -> 6, bit 1), k5 (-2 unchanged, bit 1)
        out += dht(0x10, [0, 2] + [0] * 14, [0x01, 0x10])  # 0x01->'00', 0x10->'01'
        out += sos(1, 63, 2, 1)
        w = _BitWriter()
        w.write(0b00, 2)  # sym 0x01: new coefficient, size 1
        w.write(1, 1)  # sign: positive -> +(1<<1) = +2 at k=1
        w.write(0b01, 2)  # sym 0x10: EOB1
        w.write(0, 1)  # extra bit -> eobrun = 2
        w.write(1, 1)  # correction bit for k=2 (4 -> 6)
        w.write(1, 1)  # correction bit for k=5 (-2: bit already set, no-op)
        w.flush()
        out += w.buf
        out += b"\xff\xd9"

        px = decode_jpeg(bytes(out))
        # expected: IDCT of final zigzag coef [11, 2, 6, 0, 0, -2, 0...]
        zz = np.zeros(64)
        zz[0], zz[1], zz[2], zz[5] = 11, 2, 6, -2
        nat = np.zeros(64)
        nat[ZIGZAG] = zz
        expected = _round_clip_u8(_AT @ nat.reshape(8, 8) @ _A + 128.0).astype(np.uint8)
        assert (px == expected).all()

    def test_ac_first_scan_eobrun_spans_blocks(self):
        import struct

        import numpy as np

        from tectonic_spark.operators.jpeg import (
            ZIGZAG,
            _A,
            _AT,
            _BitWriter,
            _round_clip_u8,
            decode_jpeg,
        )

        # 24x8 gray: three blocks. AC first scan: block0 has +3 at k=1,
        # then EOB1 with extra bit 1 -> eobrun = (1<<1)-1+1 = 2: blocks
        # 1 and 2 are all-zero AC without any coded bits.
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + b"\x01" * 64
        out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 24, 1)
        out += struct.pack("BBB", 1, 0x11, 0)
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + 1, 0x00)
            + bytes([1] + [0] * 15)
            + bytes([2])
        )  # DC size-2 at '0'
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
        w = _BitWriter()
        # diffs +2, +3, -2 (all size 2) -> DCs 2, 5, 3
        for bits in (0b10, 0b11, 0b01):
            w.write(0, 1)  # size-2 huffman code
            w.write(bits, 2)
        w.flush()
        out += w.buf
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + 3, 0x10)
            + bytes([0, 3] + [0] * 14)
            + bytes([0x02, 0x10, 0x00])
        )  # 0x02->'00', 0x10->'01', 0x00->'10'
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0])
        w = _BitWriter()
        w.write(0b00, 2)  # sym 0x02: run 0 size 2 at k=1
        w.write(0b11, 2)  # +3
        w.write(0b01, 2)  # EOB1
        w.write(1, 1)  # extra -> eobrun = 2
        w.flush()
        out += w.buf
        out += b"\xff\xd9"

        px = decode_jpeg(bytes(out))
        assert px.shape == (8, 24)
        for b, dc in enumerate((2, 5, 3)):
            zz = np.zeros(64)
            zz[0] = dc
            if b == 0:
                zz[1] = 3
            nat = np.zeros(64)
            nat[ZIGZAG] = zz
            exp = _round_clip_u8(_AT @ nat.reshape(8, 8) @ _A + 128.0).astype(np.uint8)
            assert (px[:, b * 8 : (b + 1) * 8] == exp).all(), b


class TestVectorizedEncoder:
    """r8: the token-stream entropy writers must be BYTE-IDENTICAL to
    the scalar golden reference across the encoder matrix."""

    def test_baseline_golden_bytes(self):
        from tectonic_spark.operators import jpeg as J

        rng = np.random.default_rng(0)
        for trial in range(12):
            h = int(rng.integers(1, 70))
            w = int(rng.integers(1, 70))
            gray = bool(rng.integers(0, 2))
            sub = ["444", "420"][int(rng.integers(0, 2))]
            q = int(rng.integers(5, 99))
            ri = [0, 1, 2, 5][int(rng.integers(0, 4))]
            img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
                np.uint8
            )
            fast = J.encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
            orig = J._encode_baseline_entropy
            J._encode_baseline_entropy = lambda *a: J._encode_scan_scalar(*a)
            try:
                ref = J.encode_jpeg(
                    img, quality=q, subsampling=sub, restart_interval=ri
                )
            finally:
                J._encode_baseline_entropy = orig
            assert fast == ref, (trial, h, w, gray, sub, q, ri)

    def test_progressive_golden_bytes(self):
        from tectonic_spark.operators import jpeg as J

        rng = np.random.default_rng(1)
        for trial in range(12):
            h = int(rng.integers(1, 60))
            w = int(rng.integers(1, 60))
            gray = bool(rng.integers(0, 2))
            sub = ["444", "420"][int(rng.integers(0, 2))]
            A = int(rng.integers(0, 4))
            ri = [0, 1, 3][int(rng.integers(0, 3))]
            bands = [((1, 5), (6, 63)), ((1, 63),), ((1, 2), (3, 20), (21, 63))][
                int(rng.integers(0, 3))
            ]
            img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
                np.uint8
            )
            kw = dict(
                subsampling=sub, bands=bands, successive=A, restart_interval=ri
            )
            fast = J.encode_jpeg_progressive(img, **kw)
            J._PROG_VEC = False
            try:
                ref = J.encode_jpeg_progressive(img, **kw)
            finally:
                J._PROG_VEC = True
            assert fast == ref, (trial, h, w, gray, sub, A, ri, bands)

    def test_golden_bytes_hypothesis(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from tectonic_spark.operators import jpeg as J

        @settings(max_examples=20, deadline=None)
        @given(
            h=st.integers(1, 33),
            w=st.integers(1, 33),
            gray=st.booleans(),
            q=st.sampled_from([25, 50, 85]),
            ri=st.sampled_from([0, 1, 2]),
            seed=st.integers(0, 2**31),
        )
        def check(h, w, gray, q, ri, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
                np.uint8
            )
            fast = J.encode_jpeg(img, quality=q, restart_interval=ri)
            orig = J._encode_baseline_entropy
            J._encode_baseline_entropy = lambda *a: J._encode_scan_scalar(*a)
            try:
                ref = J.encode_jpeg(img, quality=q, restart_interval=ri)
            finally:
                J._encode_baseline_entropy = orig
            assert fast == ref

        check()

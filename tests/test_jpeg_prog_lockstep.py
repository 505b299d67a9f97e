"""Batch==scalar bit-equality for the progressive lockstep lane engine
(jpeg_prog_lockstep.py): the four scan machines (DC/AC x first/refine),
EOB-runs, successive approximation, restart segments, gates, caps, and
error parity — all pinned against the scalar progressive decoder."""
import struct

import numpy as np
import pytest

import tectonic_spark.operators.jpeg_prog_lockstep as prog
from tectonic_spark.operators.jpeg import (
    ZIGZAG,
    _A,
    _AT,
    _BitWriter,
    _round_clip_u8,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch


@pytest.fixture(autouse=True)
def _open_gates(monkeypatch):
    """Route every progressive payload through the lane engine (the
    production gates are measured perf thresholds, not correctness)."""
    monkeypatch.setattr(prog, "MIN_PROG_LANES", 0)
    monkeypatch.setattr(prog, "MIN_IMG_BYTES", 0)


def _batch_equal(payloads):
    scalar = [decode_jpeg(p) for p in payloads]
    batch = decode_jpeg_batch(payloads)
    for i, (a, b) in enumerate(zip(scalar, batch)):
        assert a.shape == b.shape, i
        assert (a == b).all(), i
    return scalar


class TestBatchEqualsScalar:
    def test_spectral_selection_matrix(self):
        rng = np.random.default_rng(7)
        payloads = []
        for gray in (True, False):
            for sub in ("444", "420"):
                for bands in (((1, 5), (6, 63)), ((1, 63),)):
                    h, w = int(rng.integers(8, 72)), int(rng.integers(8, 72))
                    img = rng.integers(
                        0, 256, (h, w) if gray else (h, w, 3)
                    ).astype(np.uint8)
                    payloads.append(
                        encode_jpeg_progressive(img, subsampling=sub, bands=bands)
                    )
        _batch_equal(payloads)

    def test_successive_approximation_matrix(self):
        rng = np.random.default_rng(11)
        payloads = []
        for A in (1, 2, 3, 4):
            for gray in (True, False):
                h, w = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
                    np.uint8
                )
                payloads.append(
                    encode_jpeg_progressive(
                        img,
                        subsampling="420" if not gray else "444",
                        bands=((1, 2), (3, 20), (21, 63)),
                        successive=A,
                    )
                )
        _batch_equal(payloads)

    def test_odd_dims_and_one_pixel(self):
        rng = np.random.default_rng(5)
        payloads = []
        for h, w in ((1, 1), (7, 9), (8, 8), (17, 33), (65, 9)):
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            payloads.append(encode_jpeg_progressive(img, successive=2))
        _batch_equal(payloads)

    def test_mixed_progressive_and_baseline_batch(self):
        rng = np.random.default_rng(9)
        payloads = []
        for i in range(8):
            img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
            if i % 2:
                payloads.append(encode_jpeg_progressive(img, successive=1))
            else:
                payloads.append(encode_jpeg(img))
        _batch_equal(payloads)

    def test_matches_baseline_pixels_exactly(self):
        # same quantized coefficients -> progressive decode must equal
        # the baseline decode bit-for-bit
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsampling="420"))
        p = encode_jpeg_progressive(img, subsampling="420", successive=2)
        (px,) = decode_jpeg_batch([p])
        assert (px == base).all()

    def test_coef_cap_splits_pool_exactly(self, monkeypatch):
        monkeypatch.setattr(prog, "COEF_BYTE_CAP", 1)  # every image its own
        rng = np.random.default_rng(21)
        payloads = [
            encode_jpeg_progressive(
                rng.integers(0, 256, (24, 24)).astype(np.uint8), successive=1
            )
            for _ in range(6)
        ]
        _batch_equal(payloads)


class TestHypothesisSweep:
    def test_hypothesis_batch_equals_scalar(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(1, 40),
            w=st.integers(1, 40),
            gray=st.booleans(),
            sub=st.sampled_from(["444", "420"]),
            quality=st.sampled_from([25, 50, 85]),
            successive=st.integers(0, 3),
            seed=st.integers(0, 2**31),
        )
        def check(h, w, gray, sub, quality, successive, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w) if gray else (h, w, 3)).astype(
                np.uint8
            )
            p = encode_jpeg_progressive(
                img,
                quality=quality,
                subsampling=sub,
                bands=((1, 9), (10, 63)),
                successive=successive,
            )
            a = decode_jpeg(p)
            (b,) = decode_jpeg_batch([p])
            assert (a == b).all()

        check()


def _dht(tid, bits, vals):
    return (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(vals), tid)
        + bytes(bits)
        + bytes(vals)
    )


def _sos1(ss, se, ah, al):
    return (
        b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, ss, se, (ah << 4) | al])
    )


def _expected_px(zz_vals: dict) -> np.ndarray:
    zz = np.zeros(64)
    for k, v in zz_vals.items():
        zz[k] = v
    nat = np.zeros(64)
    nat[ZIGZAG] = zz
    return _round_clip_u8(_AT @ nat.reshape(8, 8) @ _A + 128.0).astype(np.uint8)


class TestHandBuiltStreams:
    def test_successive_approximation_eobrun_stream(self):
        """The test_jpeg.py hand-built stream (EOB1 with correction
        bits, refine insertion, DC refine) through the lane engine."""
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + b"\x01" * 64
        out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += struct.pack("BBB", 1, 0x11, 0)
        out += _dht(0x00, [1] + [0] * 15, [3])
        out += _sos1(0, 0, 0, 1)
        w = _BitWriter()
        w.write(0, 1)
        w.write(0b101, 3)
        w.flush()
        out += w.buf
        out += _dht(0x10, [0, 3] + [0] * 14, [0x12, 0x21, 0x00])
        out += _sos1(1, 63, 0, 1)
        w = _BitWriter()
        w.write(0b00, 2)
        w.write(0b10, 2)
        w.write(0b01, 2)
        w.write(0b0, 1)
        w.write(0b10, 2)
        w.flush()
        out += w.buf
        out += _sos1(0, 0, 1, 0)
        w = _BitWriter()
        w.write(1, 1)
        w.flush()
        out += w.buf
        out += _dht(0x10, [0, 2] + [0] * 14, [0x01, 0x10])
        out += _sos1(1, 63, 2, 1)
        w = _BitWriter()
        w.write(0b00, 2)
        w.write(1, 1)
        w.write(0b01, 2)
        w.write(0, 1)
        w.write(1, 1)
        w.write(1, 1)
        w.flush()
        out += w.buf
        out += b"\xff\xd9"

        data = bytes(out)
        (px,) = decode_jpeg_batch([data])
        assert (px == decode_jpeg(data)).all()
        assert (px == _expected_px({0: 11, 1: 2, 2: 6, 5: -2})).all()

    def test_ac_first_eobrun_spans_blocks(self):
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + b"\x01" * 64
        out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 24, 1)
        out += struct.pack("BBB", 1, 0x11, 0)
        out += _dht(0x00, [1] + [0] * 15, [2])
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
        w = _BitWriter()
        for bits in (0b10, 0b11, 0b01):
            w.write(0, 1)
            w.write(bits, 2)
        w.flush()
        out += w.buf
        out += _dht(0x10, [0, 3] + [0] * 14, [0x02, 0x10, 0x00])
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0])
        w = _BitWriter()
        w.write(0b00, 2)
        w.write(0b11, 2)
        w.write(0b01, 2)
        w.write(1, 1)
        w.flush()
        out += w.buf
        out += b"\xff\xd9"

        data = bytes(out)
        (px,) = decode_jpeg_batch([data])
        assert (px == decode_jpeg(data)).all()

    def test_restart_interval_progressive_stream(self):
        """DRI=1 progressive stream: three single-block restart segments
        per scan — lane-per-segment split, DC predictor and EOB-run
        resets at every boundary, refine bit per block per segment."""
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + b"\x01" * 64
        out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 24, 1)
        out += struct.pack("BBB", 1, 0x11, 0)
        out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1
        # DC first (al=1): per-segment DCs 3, 2, -1 (preds reset)
        out += _dht(0x00, [0, 3] + [0] * 14, [1, 2, 3])  # sizes 1..3, len-2
        out += _sos1(0, 0, 0, 1)
        w = _BitWriter()
        w.write(0b01, 2)  # size 2
        w.write(0b11, 2)  # +3
        w.flush()
        out += w.buf + b"\xff\xd0"
        w = _BitWriter()
        w.write(0b01, 2)
        w.write(0b10, 2)  # +2
        w.flush()
        out += w.buf + b"\xff\xd1"
        w = _BitWriter()
        w.write(0b00, 2)  # size 1
        w.write(0b0, 1)  # -1
        w.flush()
        out += w.buf
        # AC first (al=0): block0 +3 at k=1 then EOB0; others EOB0
        out += _dht(0x10, [0, 2] + [0] * 14, [0x02, 0x00])
        out += _sos1(1, 63, 0, 0)
        w = _BitWriter()
        w.write(0b00, 2)
        w.write(0b11, 2)  # +3
        w.write(0b01, 2)  # EOB0
        w.flush()
        out += w.buf + b"\xff\xd0"
        w = _BitWriter()
        w.write(0b01, 2)
        w.flush()
        out += w.buf + b"\xff\xd1"
        w = _BitWriter()
        w.write(0b01, 2)
        w.flush()
        out += w.buf
        # DC refine (ah=1, al=0): bits 1, 0, 0 -> DCs 7, 4, -2
        out += _sos1(0, 0, 1, 0)
        w = _BitWriter()
        w.write(1, 1)
        w.flush()
        out += w.buf + b"\xff\xd0"
        w = _BitWriter()
        w.write(0, 1)
        w.flush()
        out += w.buf + b"\xff\xd1"
        w = _BitWriter()
        w.write(0, 1)
        w.flush()
        out += w.buf
        out += b"\xff\xd9"

        data = bytes(out)
        scalar = decode_jpeg(data)
        (px,) = decode_jpeg_batch([data])
        assert (px == scalar).all()
        for b, vals in enumerate(({0: 7, 1: 3}, {0: 4}, {0: -2})):
            assert (px[:, b * 8 : (b + 1) * 8] == _expected_px(vals)).all(), b


class TestErrorParity:
    def _payload(self):
        rng = np.random.default_rng(17)
        img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        return encode_jpeg_progressive(img, successive=1)

    def test_truncated_raises_both_paths(self):
        p = self._payload()
        bad = p[: len(p) * 2 // 3]
        with pytest.raises((ValueError, EOFError)):
            decode_jpeg(bad)
        with pytest.raises((ValueError, EOFError)):
            decode_jpeg_batch([bad])

    def test_corrupt_entropy_raises_both_paths(self):
        p = bytearray(self._payload())
        # find the first SOS and smash entropy bytes after it
        i = p.find(b"\xff\xda")
        j = i + 30
        for k in range(j, min(j + 24, len(p) - 2)):
            p[k] = 0x55
        data = bytes(p)
        scalar_err = batch_err = None
        try:
            decode_jpeg(data)
        except (ValueError, EOFError) as e:  # noqa: PERF203
            scalar_err = type(e)
        try:
            decode_jpeg_batch([data])
        except (ValueError, EOFError) as e:
            batch_err = type(e)
        assert (scalar_err is None) == (batch_err is None)


class TestRestartIntervalEncoder:
    def test_restart_encode_roundtrip_equals_baseline(self):
        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, (48, 40)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img))
        for ri, A in ((1, 0), (3, 1), (8, 2)):
            p = encode_jpeg_progressive(
                img, successive=A, restart_interval=ri, bands=((1, 9), (10, 63))
            )
            assert (decode_jpeg(p) == base).all(), (ri, A)
            (px,) = decode_jpeg_batch([p])
            assert (px == base).all(), (ri, A)

    def test_restart_color_roundtrip(self):
        rng = np.random.default_rng(43)
        img = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsampling="420"))
        p = encode_jpeg_progressive(
            img, subsampling="420", successive=1, restart_interval=2
        )
        assert (decode_jpeg(p) == base).all()
        (px,) = decode_jpeg_batch([p])
        assert (px == base).all()


class TestGatesAndRouting:
    def test_small_batch_routes_scalar_same_result(self, monkeypatch):
        monkeypatch.setattr(prog, "MIN_PROG_LANES", 10**9)
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        p = encode_jpeg_progressive(img, successive=1)
        (px,) = decode_jpeg_batch([p])
        assert (px == decode_jpeg(p)).all()

    def test_payload_rides_prog_engine_predicate(self, monkeypatch):
        monkeypatch.setattr(prog, "MIN_IMG_BYTES", 0)
        monkeypatch.setattr(prog, "MIN_PROG_LANES", 576)  # production gate
        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, (128, 128)).astype(np.uint8)
        # RI=2 over 256-block scans -> 128 segments x 6 scans = 768 lanes
        p_rst = encode_jpeg_progressive(img, successive=1, restart_interval=2)
        p_plain = encode_jpeg_progressive(img, successive=1)
        b = encode_jpeg(img)
        assert prog.payload_rides_prog_engine(p_rst)
        assert not prog.payload_rides_prog_engine(p_plain)  # 6 lanes solo
        assert not prog.payload_rides_prog_engine(b)  # baseline
        assert not prog.payload_rides_prog_engine(b"junk")

    def test_density_gate_respected(self, monkeypatch):
        monkeypatch.setattr(prog, "MIN_IMG_BYTES", 10**9)
        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        p = encode_jpeg_progressive(img, successive=1, restart_interval=2)
        assert not prog.payload_rides_prog_engine(p)
        # still decodes correctly through the scalar route
        (px,) = decode_jpeg_batch([p])
        assert (px == decode_jpeg(p)).all()

"""FLAC codec + MP3 frame-walker tests (round-6 compressed audio).

The encoder emits only CONSTANT/FIXED subframes with single Rice
partitions, so the decoder paths it cannot reach — LPC subframes, RICE2
residuals, escaped partitions, wasted bits, all three stereo
decorrelation modes, multi-partition residuals — are pinned here with
hand-built bitstreams (we write the frame bits directly with the codec's
own _BitWriter + CRC helpers, which the decoder verifies independently).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from tectonic_spark.operators import codecs
from tectonic_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac,
    encode_flac,
)

REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


# ------------------------------------------------------------- roundtrips


def test_flac_roundtrip_mono_exact():
    rng = np.random.default_rng(11)
    pcm = np.concatenate(
        [
            np.arange(500, dtype=np.int64) * 7 % 16000 - 8000,
            np.full(128, -321),
            rng.integers(-32768, 32768, 300),
        ]
    ).astype(np.int16)
    data = encode_flac(pcm, sample_rate=8000, block_size=128)
    rate, out = decode_flac(data)
    assert rate == 8000
    assert (out[:, 0] == pcm.astype(np.int64)).all()


def test_flac_roundtrip_stereo_exact():
    rng = np.random.default_rng(12)
    st = rng.integers(-20000, 20000, (777, 2)).astype(np.int16)
    data = encode_flac(st, sample_rate=44100, block_size=192)
    rate, out = decode_flac(data)
    assert rate == 44100
    assert out.shape == (777, 2)
    assert (out == st.astype(np.int64)).all()


def test_flac_compresses_smooth_signals():
    pcm = (np.arange(4096) % 1000).astype(np.int16)  # ramp: tiny residuals
    data = encode_flac(pcm, block_size=512)
    assert len(data) < pcm.nbytes / 2


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_flac_short_streams(n):
    pcm = np.array([(i * 911 % 999) - 500 for i in range(n)], dtype=np.int16)
    data = encode_flac(pcm, block_size=4)
    _, out = decode_flac(data)
    assert (out[:, 0] == pcm.astype(np.int64)).all()


def test_flac_corruption_detected():
    pcm = np.arange(512, dtype=np.int16)
    data = bytearray(encode_flac(pcm, block_size=256))
    data[len(data) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_flac_md5_guards_whole_stream():
    pcm = np.arange(300, dtype=np.int16)
    data = bytearray(encode_flac(pcm, block_size=256))
    # corrupt the STREAMINFO md5 itself: frames pass CRC, md5 must fail
    data[26] ^= 0xFF  # inside the 16-byte md5 field (streaminfo @ 8+18)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(data))
    rate, out = decode_flac(bytes(data), verify_md5=False)
    assert (out[:, 0] == np.arange(300)).all()


# ------------------------------------------- hand-built decoder-only paths


def _frame_header(ch_code: int, bs: int, frame_no: int = 0) -> bytes:
    """Frame header for a 16-bit, streaminfo-rate frame with 16-bit
    blocksize-at-end coding."""
    h = _BitWriter()
    h.write(0b11111111111110, 14)
    h.write(0, 1)
    h.write(0, 1)
    h.write(0b0111, 4)  # blocksize: 16-bit at end
    h.write(0, 4)  # samplerate: streaminfo
    h.write(ch_code, 4)
    h.write(0b100, 3)  # 16 bps
    h.write(0, 1)
    head = h.bytes() + _utf8_coded(frame_no) + struct.pack(">H", bs - 1)
    return head + bytes((_crc8(head),))


def _streaminfo(n: int, ch: int, bs: int, rate: int = 8000) -> bytes:
    w = _BitWriter()
    w.write(bs, 16)
    w.write(bs, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(ch - 1, 3)
    w.write(15, 5)
    w.write(n, 36)
    w.align()
    info = w.bytes() + b"\x00" * 16  # md5 unknown
    return b"fLaC" + bytes((0x80,)) + len(info).to_bytes(3, "big") + info


def _write_verbatim(w: _BitWriter, samples, bps: int) -> None:
    w.write(0, 1)
    w.write(0b000001, 6)
    w.write(0, 1)
    for s in samples:
        w.write(int(s) & ((1 << bps) - 1), bps)


def _finish_frame(head: bytes, w: _BitWriter) -> bytes:
    w.align()
    frame = head + w.bytes()
    return frame + struct.pack(">H", _crc16(frame))


@pytest.mark.parametrize(
    "ch_code,name",
    [(8, "left-side"), (9, "right-side"), (10, "mid-side")],
)
def test_flac_stereo_decorrelation_modes(ch_code, name):
    left = np.array([100, -250, 377, 0, -32768, 32767, 5, -5], dtype=np.int64)
    right = np.array([90, -260, 400, 1, -32768, 32767, -5, 5], dtype=np.int64)
    bs = len(left)
    if ch_code == 8:  # left + side
        sub0, b0 = left, 16
        sub1, b1 = left - right, 17
    elif ch_code == 9:  # side + right
        sub0, b0 = left - right, 17
        sub1, b1 = right, 16
    else:  # mid + side
        sub0, b0 = (left + right) >> 1, 16
        sub1, b1 = left - right, 17
    head = _frame_header(ch_code, bs)
    w = _BitWriter()
    _write_verbatim(w, sub0, b0)
    _write_verbatim(w, sub1, b1)
    data = _streaminfo(bs, 2, bs) + _finish_frame(head, w)
    _, out = decode_flac(data, verify_md5=False)
    assert (out[:, 0] == left).all(), name
    assert (out[:, 1] == right).all(), name


def test_flac_lpc_subframe():
    # order-2 LPC, coefs [3, -1], shift 1: s[i] = res + (3*s[i-1]-s[i-2])>>1
    warm = [100, 140]
    res = [7, -3, 12, 0, -9, 4]
    bs = len(warm) + len(res)
    samples = list(warm)
    for r in res:
        pred = (3 * samples[-1] - samples[-2]) >> 1
        samples.append(r + pred)
    head = _frame_header(0, bs)  # mono
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b100000 | (2 - 1), 6)  # LPC order 2
    w.write(0, 1)
    for s in warm:
        w.write(s & 0xFFFF, 16)
    w.write(4 - 1, 4)  # precision 4 bits
    w.write(1, 5)  # shift 1
    w.write(3 & 0xF, 4)  # coef[0] = 3
    w.write(-1 & 0xF, 4)  # coef[1] = -1
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(3, 4)  # rice k = 3
    for r in res:
        zig = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(zig >> 3)
        w.write(zig & 7, 3)
    data = _streaminfo(bs, 1, bs) + _finish_frame(head, w)
    _, out = decode_flac(data, verify_md5=False)
    assert out[:, 0].tolist() == samples


def test_flac_rice2_multipartition_and_escape():
    # mono FIXED order-0 (residual == samples), RICE2 (method 1), partition
    # order 1 → two partitions; second partition ESCAPED with raw 6-bit
    vals = [3, -4, 10, -1, 17, -30, 2, 0]
    bs = len(vals)
    head = _frame_header(0, bs)
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b001000, 6)  # FIXED order 0
    w.write(0, 1)
    w.write(1, 2)  # method 1 = RICE2 (5-bit params)
    w.write(1, 4)  # partition order 1 → 2 partitions of 4
    w.write(2, 5)  # partition 1: k=2
    for r in vals[:4]:
        zig = 2 * r if r >= 0 else -2 * r - 1
        w.write_unary(zig >> 2)
        w.write(zig & 3, 2)
    w.write(31, 5)  # partition 2: escape
    w.write(6, 5)  # 6-bit raw residuals
    for r in vals[4:]:
        w.write(r & 0x3F, 6)
    data = _streaminfo(bs, 1, bs) + _finish_frame(head, w)
    _, out = decode_flac(data, verify_md5=False)
    assert out[:, 0].tolist() == vals


def test_flac_wasted_bits():
    raw = [12, -40, 96, 8]  # all divisible by 4 → 2 wasted bits
    vals = [v << 2 for v in raw]
    bs = len(vals)
    head = _frame_header(0, bs)
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b000001, 6)  # VERBATIM
    w.write(1, 1)  # wasted-bits flag
    w.write_unary(2 - 1)  # wasted = 1 + unary
    for v in raw:
        w.write(v & 0x3FFF, 14)  # eff bps = 16 - 2
    data = _streaminfo(bs, 1, bs) + _finish_frame(head, w)
    _, out = decode_flac(data, verify_md5=False)
    assert out[:, 0].tolist() == vals


def test_flac_fixed_orders_0_to_4():
    # hand-encode each fixed order over a cubic signal; decoder must invert
    n = 24
    s = [((i**3 - 5 * i * i + 3 * i) % 3000) - 1500 for i in range(n)]
    for order in range(5):
        res = list(s)
        for _ in range(order):
            res = [res[i] - res[i - 1] for i in range(1, len(res))]
        head = _frame_header(0, n)
        w = _BitWriter()
        w.write(0, 1)
        w.write(0b001000 | order, 6)
        w.write(0, 1)
        for i in range(order):
            w.write(s[i] & 0xFFFF, 16)
        w.write(0, 2)
        w.write(0, 4)
        w.write(14, 4)  # large k: values fit directly
        for r in res:
            zig = 2 * r if r >= 0 else -2 * r - 1
            w.write_unary(zig >> 14)
            w.write(zig & ((1 << 14) - 1), 14)
        data = _streaminfo(n, 1, n) + _finish_frame(head, w)
        _, out = decode_flac(data, verify_md5=False)
        assert out[:, 0].tolist() == s, f"order {order}"


# ------------------------------------------------------------ MP3 walker


def test_mp3_walk_synthetic_cbr():
    d = codecs.encode_mp3_frames(7, 11, pad_fn=lambda f: f % 2)
    info = codecs.parse_mp3(d)
    assert info["n_frames"] == 7
    assert info["samplerate"] == 44100
    assert info["bitrate_kbps"] == 192
    assert info["total_samples"] == 7 * 1152
    assert info["bytes_walked"] == len(d)


def test_mp3_walk_mono_side_info():
    d = codecs.encode_mp3_frames(3, 9, channel_mode=3)
    info = codecs.parse_mp3(d)
    assert info["n_frames"] == 3


def test_mp3_truncation_detected():
    d = codecs.encode_mp3_frames(4, 9)
    with pytest.raises(ValueError, match="truncated"):
        codecs.parse_mp3(d[:-10])


def test_mp3_desync_detected():
    d = bytearray(codecs.encode_mp3_frames(4, 9))
    d[0] = 0x00
    with pytest.raises(ValueError, match="sync"):
        codecs.parse_mp3(bytes(d))


def test_mp3_id3v2_skip():
    body = codecs.encode_mp3_frames(2, 9)
    tag = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 60]) + b"\x00" * 60
    info = codecs.parse_mp3(tag + body)
    assert info["n_frames"] == 2


@pytest.mark.skipif(not os.path.exists(REAL_MP3), reason="no real-world mp3 on host")
def test_mp3_walks_real_world_file():
    """A REAL MPEG-2 Layer III file (gsutil test fixture): the walker must
    account for every byte, land on a standard rate, and report sane
    bit-reservoir offsets — transcription errors in the bitrate/size
    tables cannot survive an exact byte-extent match."""
    with open(REAL_MP3, "rb") as f:
        data = f.read()
    info = codecs.parse_mp3(data)
    assert info["bytes_walked"] == len(data)
    assert info["samplerate"] in (22050, 24000, 16000)
    assert info["n_frames"] > 10
    assert 0 <= info["max_main_data_begin"] < 512


def test_mp3_vbr_stream_walks_and_flags():
    """VBR: frames sized from their own headers; walker flags it and
    reports the mean rate."""
    frames = b"".join(
        codecs.encode_mp3_frames(1, idx) for idx in (9, 12, 14, 9, 11)
    )
    info = codecs.parse_mp3(frames)
    assert info["n_frames"] == 5
    assert info["vbr"] is True
    assert info["bytes_walked"] == len(frames)
    assert (
        info["mean_bitrate_kbps"]
        == (128 + 224 + 320 + 128 + 192) // 5
    )
    cbr = codecs.parse_mp3(codecs.encode_mp3_frames(4, 11))
    assert cbr["vbr"] is False and cbr["mean_bitrate_kbps"] == 192


# ------------------------------------------------- FLAC property tests


def test_flac_roundtrip_property():
    """Hypothesis: ANY int16 PCM (mono or stereo, any length, any block
    size) must round-trip bit-exactly — the lossless guarantee."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600
        ),
        stereo=st.booleans(),
        block=st.sampled_from([4, 16, 64, 192, 256]),
    )
    def check(data, stereo, block):
        pcm = np.array(data, dtype=np.int16)
        if stereo:
            pcm = np.stack([pcm, pcm[::-1]], axis=1)
        out = decode_flac(encode_flac(pcm, block_size=block))[1]
        ref = pcm.astype(np.int64)
        if ref.ndim == 1:
            ref = ref[:, None]
        assert (out == ref).all()

    check()


def test_flac_lpc_encoder_roundtrip_orders():
    """Encoder LPC mode (r8): deterministic-coefficient LPC subframes at
    every order class round-trip bit-exactly, mono and stereo."""
    rng = np.random.default_rng(5)
    for order in (1, 2, 4, 8, 12, 31, 32):
        for ch in (1, 2):
            n = 700 + order
            pcm = rng.normal(0, 2500, (n, ch)).clip(-32768, 32767).astype(np.int16)
            if ch == 1:
                pcm = pcm[:, 0]
            out = decode_flac(encode_flac(pcm, block_size=256, lpc_order=order))[1]
            ref = pcm.reshape(n, -1).astype(np.int64)
            assert (out == ref).all(), (order, ch)


def test_flac_lpc_batch_equals_scalar_above_gates():
    """The cross-lane lockstep LPC filter (r8) is bit-identical to the
    scalar loop: 72 lanes of 4096-sample blocks, mixed FIXED/LPC orders,
    mixed mono/stereo — above MIN_BATCH_LANES and MIN_BATCH_BLOCK so the
    engine (Rice lanes + LPC prediction pool) actually runs."""
    from tectonic_spark.operators.flac import decode_flac_batch

    rng = np.random.default_rng(11)
    payloads = []
    for i in range(72):
        n = 6000 + i * 13
        ch = 1 + i % 2
        pcm = rng.normal(0, 3000, (n, ch)).clip(-32768, 32767).astype(np.int16)
        if ch == 1:
            pcm = pcm[:, 0]
        payloads.append(
            encode_flac(pcm, block_size=1024, lpc_order=(0, 2, 8, 12)[i % 4])
        )
    scalar = [decode_flac(p) for p in payloads]
    batch = decode_flac_batch(payloads)
    for (sa, pa), (sb, pb) in zip(scalar, batch):
        assert sa == sb
        assert (pa == pb).all()


def test_flac_lpc_lockstep_filter_direct():
    """_lpc_batch == _lpc_scalar on ragged mixed-order items (the filter
    pads lanes to the max order and masks finished lanes)."""
    from tectonic_spark.operators.flac import _lpc_batch, _lpc_coefs, _lpc_scalar

    rng = np.random.default_rng(13)
    items, expect = [], []
    for i in range(20):
        order = (1, 2, 5, 8, 12, 32)[i % 6]
        bs = 64 + 37 * i
        co, shift, _ = _lpc_coefs(order)
        res = rng.integers(-4000, 4000, bs - order).astype(np.int64)
        warm = rng.integers(-20000, 20000, order).astype(np.int64)
        out_a = np.empty(bs, dtype=np.int64)
        out_a[:order] = warm
        out_b = out_a.copy()
        _lpc_scalar(co, shift, order, res, out_a)
        items.append(("lpc", i, co, shift, order, res, out_b))
        expect.append(out_a)
    _lpc_batch(items)  # 20 >= MIN_LPC_LANES -> vectorized path
    for it, exp in zip(items, expect):
        assert (it[6] == exp).all()


def test_flac_first_subframe_is_lpc_pin():
    from tectonic_spark.operators.flac import first_subframe_is_lpc

    rng = np.random.default_rng(17)
    pcm = rng.normal(0, 2500, 500).clip(-32768, 32767).astype(np.int16)
    assert first_subframe_is_lpc(encode_flac(pcm, lpc_order=8))
    assert not first_subframe_is_lpc(encode_flac(pcm))
    const = np.full(500, 7, dtype=np.int16)
    assert not first_subframe_is_lpc(encode_flac(const, lpc_order=8))  # CONSTANT
    import pytest as _pt

    with _pt.raises(ValueError):
        first_subframe_is_lpc(b"nope")


def test_flac_lpc_roundtrip_property():
    """Hypothesis: LPC mode keeps the lossless guarantee at any order."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        data=st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=2, max_size=400
        ),
        stereo=st.booleans(),
        block=st.sampled_from([16, 64, 256]),
        order=st.integers(min_value=1, max_value=12),
    )
    def check(data, stereo, block, order):
        pcm = np.array(data, dtype=np.int16)
        if stereo:
            pcm = np.stack([pcm, pcm[::-1]], axis=1)
        out = decode_flac(encode_flac(pcm, block_size=block, lpc_order=order))[1]
        ref = pcm.astype(np.int64)
        if ref.ndim == 1:
            ref = ref[:, None]
        assert (out == ref).all()

    check()

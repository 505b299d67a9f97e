"""Lockstep FLAC batch decode == scalar decode (r7).

The control path is the shared generator core, so divergence can only
come from the engine's Rice step / lane bookkeeping — pinned here with
gates monkeypatched low so small fixtures actually ride the engine."""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators import flac as fl


@pytest.fixture()
def force_batch(monkeypatch):
    monkeypatch.setattr(fl, "MIN_BATCH_LANES", 1)
    monkeypatch.setattr(fl, "MIN_BATCH_BLOCK", 0)


def _mk(n, bs, i, stereo=False, sr=8000):
    rng = np.random.default_rng(100 + i)
    t = np.arange(n, dtype=np.float64)
    if stereo:
        pcm = np.stack(
            [
                (8000 * np.sin(t / (13 + i))).astype(np.int16),
                (7000 * np.cos(t / (7 + i)) + rng.normal(0, 200, n)).astype(np.int16),
            ],
            axis=1,
        )
    else:
        pcm = (9000 * np.sin(t / (11 + i)) + rng.normal(0, 300, n)).astype(np.int16)
    return fl.encode_flac(pcm, sample_rate=sr, block_size=bs)


def _check(payloads, **kw):
    ref = [fl.decode_flac(p, **kw) for p in payloads]
    got = fl.decode_flac_batch(payloads, **kw)
    for (r1, a1), (r2, a2) in zip(ref, got):
        assert r1 == r2 and a1.shape == a2.shape and (a1 == a2).all()


@pytest.mark.usefixtures("force_batch")
def test_mixed_batch_equality():
    # mixed block sizes de-phase lane completions — the regression case
    # that caught the cursor/region-base conflation during development
    payloads = [
        _mk(3000 + i * 137, 128 + (i % 3) * 64, i, stereo=(i % 3 != 0), sr=8000 + i)
        for i in range(24)
    ]
    _check(payloads)


@pytest.mark.usefixtures("force_batch")
def test_boundary_values_batch():
    pcm = np.array([-32768, 32767, 0, -1, 1, -32768, 32767, -32768] * 64, np.int16)
    payloads = [fl.encode_flac(pcm, block_size=64)] * 9
    _check(payloads)


@pytest.mark.usefixtures("force_batch")
def test_truncated_payload_raises_in_batch():
    good = _mk(4000, 256, 1)
    bad = good[: len(good) - 40]
    with pytest.raises(ValueError):
        fl.decode_flac(bad)
    with pytest.raises(ValueError):
        fl.decode_flac_batch([bad] + [good] * 8)


def test_production_gates_route_correctly():
    small = [_mk(500, 128, i) for i in range(4)]  # < MIN_BATCH_LANES
    _check(small)
    big_blocks = [_mk(9000, 4096, i) for i in range(fl.MIN_BATCH_LANES)]
    _check(big_blocks)  # engine path under real gates


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 700),
    bs=st.sampled_from([16, 64, 192, 256]),
    stereo=st.booleans(),
    seed=st.integers(0, 10_000),
)
def test_property_batch_equals_scalar(n, bs, stereo, seed):
    gates = (fl.MIN_BATCH_LANES, fl.MIN_BATCH_BLOCK)
    fl.MIN_BATCH_LANES, fl.MIN_BATCH_BLOCK = 1, 0
    try:
        rng = np.random.default_rng(seed)
        pcm = rng.integers(-32768, 32768, (n, 2) if stereo else n).astype(np.int16)
        p = fl.encode_flac(pcm, block_size=bs)
        # 3 lanes of the same payload + 1 different-length one: de-phased
        q = fl.encode_flac(pcm[: max(1, n // 2)], block_size=bs)
        _check([p, q, p, p])
    finally:
        fl.MIN_BATCH_LANES, fl.MIN_BATCH_BLOCK = gates


def test_pool_byte_cap_splits_batches(monkeypatch):
    monkeypatch.setattr(fl, "MIN_BATCH_LANES", 1)
    monkeypatch.setattr(fl, "MIN_BATCH_BLOCK", 0)
    monkeypatch.setattr(fl, "POOL_BYTE_CAP", 4_000)
    payloads = [_mk(2000 + 100 * i, 256, i) for i in range(10)]
    _check(payloads)

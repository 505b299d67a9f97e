"""Lockstep batch JPEG decode == scalar decode, bit for bit.

The lane engine (jpeg_lockstep.py) must be indistinguishable from the
scalar per-symbol walk for every stream the scalar path accepts, and
raise for every stream it rejects. Gates are monkeypatched to zero in
most tests so the engine actually runs on small fixtures (production
gates would route them to the scalar path)."""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.operators import jpeg_lockstep as jl
from tectonic_spark.operators.jpeg import decode_jpeg, encode_jpeg
from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch


@pytest.fixture()
def force_lockstep(monkeypatch):
    """Drop every pool gate so any baseline stream rides the lane engine."""
    monkeypatch.setattr(jl, "MIN_LANES", 1)
    monkeypatch.setattr(jl, "MIN_JOB_BYTES", 0)
    monkeypatch.setattr(jl, "MIN_JOB_LANES", 1)
    monkeypatch.setattr(jl, "MAX_SEG_SKEW", 1e9)


def _img(h, w, seed=0, gray=False):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 70 * np.sin(xx / 11) + 50 * np.cos(yy / 7)
    if gray:
        return (base + rng.normal(0, 10, (h, w))).clip(0, 255).astype(np.uint8)
    return (
        np.stack([base, 255 - base, (base + 3 * xx) % 256], axis=-1)
        + rng.normal(0, 10, (h, w, 3))
    ).clip(0, 255).astype(np.uint8)


def _check(payloads):
    ref = [decode_jpeg(p) for p in payloads]
    got = decode_jpeg_batch(payloads)
    assert len(got) == len(ref)
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        assert (r == g).all()


def test_dense_restart_batch_production_gates():
    """Realistic dense batch passes the production gates and decodes
    bit-exactly through the lane engine (sanity: the engine DID run —
    lanes >= MIN_LANES by construction: 26 images x 16 segments)."""
    payloads = [
        encode_jpeg(_img(64, 64, seed=s), quality=85, subsampling="420", restart_interval=1)
        for s in range(26)
    ]
    jobs = []
    decode_jpeg(payloads[0], _collect=jobs)
    assert all(jl._job_eligible(j) is (sum(len(x) for x in j.segments) >= jl.MIN_JOB_BYTES) for j in jobs)
    _check(payloads)


@pytest.mark.usefixtures("force_lockstep")
@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 1, 2, 3, 8])
def test_color_variants(sub, ri):
    payloads = [
        encode_jpeg(_img(48, 40, seed=s), quality=q, subsampling=sub, restart_interval=ri)
        for s, q in ((0, 30), (1, 75), (2, 95))
    ]
    _check(payloads)


@pytest.mark.usefixtures("force_lockstep")
def test_gray_and_odd_dims():
    payloads = [
        encode_jpeg(_img(33, 41, seed=3, gray=True), quality=60, restart_interval=2),
        encode_jpeg(_img(17, 23, seed=4), quality=50, subsampling="420", restart_interval=1),
        encode_jpeg(_img(8, 8, seed=5), quality=90),
        encode_jpeg(_img(1, 1, seed=6, gray=True), quality=50),
    ]
    _check(payloads)


@pytest.mark.usefixtures("force_lockstep")
def test_mixed_batch_heterogeneous_settings():
    """One pool, many shapes: different dims, tables (quality), sampling,
    restart intervals, gray + color, flat DC-only + dense — the stacked
    LUT pool and ragged schedules must keep every lane independent."""
    flat = np.full((32, 32, 3), 77, dtype=np.uint8)
    payloads = [
        encode_jpeg(_img(64, 48, seed=7), quality=85, subsampling="420", restart_interval=4),
        encode_jpeg(_img(24, 56, seed=8), quality=20, subsampling="444", restart_interval=1),
        encode_jpeg(_img(40, 40, seed=9, gray=True), quality=95, restart_interval=3),
        encode_jpeg(flat, quality=50, subsampling="420"),
        encode_jpeg(_img(16, 16, seed=10), quality=70, subsampling="444"),
    ]
    _check(payloads)


def test_progressive_and_thumbnails_fall_back():
    """Ineligible members (progressive stream, tiny thumbnails, restart-
    free) decode scalar inside the same batch call and stay correct."""
    from tectonic_spark.operators.jpeg import encode_jpeg_progressive
    from tectonic_spark.operators.multimodal import _jpeg_payload

    payloads = [
        encode_jpeg_progressive(_img(32, 32, seed=11)),
        _jpeg_payload(3),
        _jpeg_payload(12),
        encode_jpeg(_img(64, 64, seed=12), quality=85, subsampling="420", restart_interval=2),
    ]
    _check(payloads)


@pytest.mark.usefixtures("force_lockstep")
def test_corrupt_entropy_raises_like_scalar():
    good = encode_jpeg(_img(64, 64, seed=13), quality=85, subsampling="420", restart_interval=2)
    # flip bytes deep in the entropy data until the scalar path raises,
    # then require the lane engine to raise on the same stream
    bad = None
    for off in range(20, 200, 7):
        cand = bytearray(good)
        cand[len(cand) - off] ^= 0x5A
        cand = bytes(cand)
        try:
            decode_jpeg(cand)
        except Exception:  # noqa: BLE001 — comparing raise behavior
            bad = cand
            break
    assert bad is not None, "no byte flip corrupted the stream"
    with pytest.raises((ValueError, EOFError)):
        decode_jpeg_batch([bad, good])


@pytest.mark.usefixtures("force_lockstep")
def test_truncated_segments_raise_missing_rst():
    good = encode_jpeg(_img(64, 64, seed=14), quality=85, subsampling="420", restart_interval=1)
    # chop the stream before the last restart marker: fewer segments than
    # ceil(mcus/RI) -> both paths report the missing restart marker
    cut = good.rfind(b"\xff\xd5")
    assert cut > 0
    bad = good[:cut]
    with pytest.raises((ValueError, EOFError)):
        decode_jpeg(bad + b"\xff\xd9")
    with pytest.raises((ValueError, EOFError)):
        decode_jpeg_batch([bad + b"\xff\xd9"])


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    quality=st.sampled_from([15, 50, 85, 97]),
    sub=st.sampled_from(["444", "420", "gray"]),
    ri=st.integers(0, 5),
    seed=st.integers(0, 10_000),
)
def test_property_batch_equals_scalar(h, w, quality, sub, ri, seed):
    gates = (jl.MIN_LANES, jl.MIN_JOB_BYTES, jl.MIN_JOB_LANES, jl.MAX_SEG_SKEW)
    jl.MIN_LANES, jl.MIN_JOB_BYTES, jl.MIN_JOB_LANES, jl.MAX_SEG_SKEW = 1, 0, 1, 1e9
    try:
        img = _img(h, w, seed=seed, gray=sub == "gray")
        p = encode_jpeg(
            img,
            quality=quality,
            subsampling="444" if sub == "gray" else sub,
            restart_interval=ri,
        )
        _check([p, p])  # same payload twice: shared tables, distinct lanes
    finally:
        jl.MIN_LANES, jl.MIN_JOB_BYTES, jl.MIN_JOB_LANES, jl.MAX_SEG_SKEW = gates


def test_pool_byte_cap_splits_batches(monkeypatch):
    """Oversized batches run as sequential pools — same pixels."""
    monkeypatch.setattr(jl, "POOL_BYTE_CAP", 20_000)
    payloads = [
        encode_jpeg(_img(64, 64, seed=s), quality=85, subsampling="420", restart_interval=1)
        for s in range(12)
    ]
    _check(payloads)


def test_pool_byte_cap_sequential_pools_exact(monkeypatch):
    """POOL_BYTE_CAP splits an oversized batch into sequential pools:
    results stay bit-identical to one big pool AND the engine actually
    flushed multiple times (the executor-memory-flatness mechanism the
    100x path relies on — scratch is bounded per pool, not per batch)."""
    import numpy as np

    import tectonic_spark.operators.jpeg_lockstep as jl
    from tectonic_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(3)
    payloads = []
    for i in range(6):
        vals = (2 * ((i * 7 + np.arange(1024)) % 128)).astype(np.uint8)
        plane = np.kron(vals.reshape(32, 32), np.ones((8, 8), dtype=np.uint8))
        plane = np.clip(
            plane.astype(np.int16) + rng.integers(-6, 6, plane.shape), 0, 255
        ).astype(np.uint8)
        payloads.append(encode_jpeg(plane, quality=85, restart_interval=4))

    monkeypatch.setattr(jl, "MIN_LANES", 1)
    big = jl.decode_jpeg_batch(payloads)

    runs = []
    orig_run = jl._Pool.run

    def counting_run(self):
        runs.append(self.nlanes)
        return orig_run(self)

    monkeypatch.setattr(jl._Pool, "run", counting_run)
    monkeypatch.setattr(jl, "POOL_BYTE_CAP", max(len(p) for p in payloads))
    capped = jl.decode_jpeg_batch(payloads)
    assert len(runs) >= 3  # the cap forced multiple sequential pools
    for a, b in zip(big, capped):
        assert (a == b).all()


def test_engine_exception_propagates_no_silent_fallback(monkeypatch):
    """The m14/m15 rode_engine value-hash pins recompute the gate
    PREDICATE, not the actual route — which is sound only while an
    engine bug fails the batch loudly. Pin that invariant: an injected
    exception inside either pool run must PROPAGATE out of
    decode_jpeg_batch, never be caught and retried on the scalar path
    (VERDICT r8 item 7)."""
    import tectonic_spark.operators.jpeg_prog_lockstep as jp
    from tectonic_spark.operators.jpeg import encode_jpeg, encode_jpeg_progressive

    # baseline engine: dense restart-laned corpus, all gates forced open
    base = [
        encode_jpeg(_img(64, 64, seed=s), quality=85, subsampling="420",
                    restart_interval=1)
        for s in range(4)
    ]
    monkeypatch.setattr(jl, "MIN_LANES", 1)
    monkeypatch.setattr(jl, "MIN_JOB_BYTES", 0)
    monkeypatch.setattr(jl, "MIN_JOB_LANES", 1)
    monkeypatch.setattr(jl, "MAX_SEG_SKEW", 1e9)
    assert all(jl.payload_rides_engine(p) for p in base)
    assert len(decode_jpeg_batch(base)) == 4  # rides the engine

    class _Boom(RuntimeError):
        pass

    def boom(self):
        raise _Boom("injected baseline engine failure")

    monkeypatch.setattr(jl._Pool, "run", boom)
    with pytest.raises(_Boom):
        decode_jpeg_batch(base)

    # progressive engine: m15-shaped payload rides on its own
    vals = (2 * ((11 + np.arange(4096) * 17) % 128)).astype(np.uint8)
    plane = np.kron(vals.reshape(64, 64), np.ones((8, 8), dtype=np.uint8))
    prog = encode_jpeg_progressive(
        plane, bands=((1, 63),), successive=1, restart_interval=16
    )
    assert jp.payload_rides_prog_engine(prog)

    def boom_prog(images, scalar_payload):
        raise _Boom("injected progressive engine failure")

    monkeypatch.setattr(jp, "run_prog_pool", boom_prog)
    with pytest.raises(_Boom):
        decode_jpeg_batch([prog])

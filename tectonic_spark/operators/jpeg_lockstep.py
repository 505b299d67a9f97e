"""Lockstep (lane-parallel) baseline JPEG entropy decode.

The scalar decoder in jpeg.py walks entropy symbols one at a time in
Python (~1 us/symbol) — correct, but the per-symbol interpreter cost is
the 100 TB scale-killer for dense photographic corpora (VERDICT r6: the
256x256 q85 w/restarts regime decoded at ~0.6 MB/s/core). This module
exploits the only parallel axes a Huffman entropy stream offers:

* RESTART SEGMENTS — T.81 E.1.4: every RSTn resets the DC predictors and
  byte-aligns the bit stream, so each segment decodes independently;
* WHOLE IMAGES — a corpus decode is batched (mapInPandas hands the UDF
  hundreds of payloads per Arrow batch), and every image's entropy data
  is independent by construction.

All segments of all images in a batch advance in LOCKSTEP: one numpy-
vectorized Huffman symbol per lane per step (~50 numpy ops on L-length
arrays). The scalar interpreter costs ~1 us per symbol per image; a step
here costs ~30-60 us regardless of lane count, so with hundreds of lanes
the per-symbol cost drops an order of magnitude. Below ~2 dozen lanes
the vectorization overhead loses — the pool gates on lane count and
per-lane density and falls back to the scalar path (thumbnail batches,
single small images).

Bit-exactness: every step reproduces the scalar path's integer ops —
the same packed 16-bit-lookahead LUTs (DC variants mask the run nibble,
which the scalar path ignores for DC), the same magnitude-extend, the
same natural-order sparse scatter, and the SHARED _scan_geometry /
_scan_idct helpers for the grid and the dequant+IDCT tail — pinned by
tests/test_jpeg_lockstep.py batch-vs-scalar equality including a
Hypothesis sweep over dims/subsampling/quality/restart intervals.

Reference parity note: the reference engine has no JPEG surface (its
multimodal story stops at opaque bytes); this module belongs to the
beyond-reference multimodal family (m08/m09/m11/s12).

100 TB shape: payloads never leave the executor; one decode call per
Arrow batch; scratch memory is O(batch entropy bytes x 8) for the
48-bit window table plus O(lanes) state arrays.
"""
from __future__ import annotations

import numpy as np

from tectonic_spark.operators.arena import ensure_flat_malloc

from tectonic_spark.operators.jpeg import (
    ZIGZAG,
    _assemble,
    _huff_lut,
    _LockstepIneligible,
    _scan_idct,
    _SEG_PAD,
    decode_jpeg,
)

# Pool gates. Lockstep only pays when many balanced lanes amortize the
# ~50 numpy ops per symbol step; these are set from local[32] host
# measurements (ROUND7.md: scalar/lockstep cross at ~64 lanes — 32 lanes
# 0.31 vs 0.56 MB/s scalar, 128 lanes 0.89, 512 lanes 1.63+) — below
# them the scalar path wins.
MIN_LANES = 96
# per-job density gate: thumbnails (4-25 B of entropy) stay scalar
MIN_JOB_BYTES = 4096
# per-job balance gate: one dominant lane serializes the whole pool
# (steps = max lane symbols), so a job whose longest segment is >4x the
# mean decodes scalar instead
MAX_SEG_SKEW = 4.0
MIN_JOB_LANES = 8

# magnitude-extend table indexed by size 0..15: EXT[s] = (1<<s)-1 is the
# value mask, the extend subtrahend, AND (>>1) the extend threshold-1 —
# at sz=0 all three are 0, so size-0 "values" never extend
_EXT = np.array([(1 << s) - 1 for s in range(16)], dtype=np.int64)
# zigzag->natural, padded to 80: kk = k + run <= 63 + 15 = 78 for the
# already-flagged run-past-end error lanes (output discarded at raise)
_ZIGPAD = np.zeros(80, dtype=np.int64)
_ZIGPAD[:64] = ZIGZAG

_LUT_NP_CACHE: dict[tuple, np.ndarray] = {}
_LUT_NP_MAX = 512


def _lut_np(raw: bytes, dc: bool) -> np.ndarray:
    """int64 LUT repacked for the lane engine from the scalar table's
    (run<<10)|(size<<5)|len to ``(run<<9)|(size<<5)|(len+size)`` — the
    fused advance saves two adds per step, and the derived shift
    48 - o - advance lands exactly on the magnitude bits. DC tables mask
    the run bits to 0 (the scalar DC step ignores them; masking keeps
    the unified kk = k + run step exact even for corrupt DC symbols with
    a nonzero high nibble)."""
    key = (raw, dc)
    hit = _LUT_NP_CACHE.get(key)
    if hit is None:
        v = np.asarray(_huff_lut(raw), dtype=np.int64)
        ln = v & 31
        sz = (v >> 5) & 31
        run = v >> 10
        arr = (run << 9) | (sz << 5) | (ln + sz)
        if dc:
            arr = arr & 0x1FF
        if len(_LUT_NP_CACHE) >= _LUT_NP_MAX:
            _LUT_NP_CACHE.clear()
        _LUT_NP_CACHE[key] = hit = arr
    return hit


class _Pool:
    """All lockstep lanes of one batch: concatenated padded segments, a
    48-bit window table, per-lane ragged block schedules, and a stacked
    LUT pool. Lane l covers MCUs [l*RI, (l+1)*RI) of its scan."""

    def __init__(self) -> None:
        self.jobs: list = []  # (job, [(comp, coef_off)] per scan comp)
        self._bufs: list[bytes] = []
        self._nbytes = 0
        self.lane_bp0: list[int] = []
        self.lane_limit: list[int] = []
        self.lane_sched: list[int] = []  # offset into flat schedules
        self.lane_nblk: list[int] = []
        self.lane_pbase: list[int] = []
        self._sb: list[np.ndarray] = []  # flat base schedule chunks
        self._sd: list[np.ndarray] = []
        self._sa: list[np.ndarray] = []
        self._sp: list[np.ndarray] = []
        self._sched_len = 0
        self._luts: list[np.ndarray] = []
        self._lut_slot: dict[tuple, int] = {}
        self.coef_total = 0
        self.npred = 0

    # -- construction ---------------------------------------------------

    def _slot(self, raw: bytes, dc: bool) -> int:
        key = (raw, dc)
        s = self._lut_slot.get(key)
        if s is None:
            s = len(self._luts)
            self._lut_slot[key] = s
            self._luts.append(_lut_np(raw, dc))
        return s

    def add_job(self, job) -> None:
        scan, ri = job.scan, job.ri
        mcus_x, mcus_y = job.mcus_x, job.mcus_y
        M = mcus_x * mcus_y
        ri = ri if ri else M
        needed = (M + ri - 1) // ri
        if len(job.segments) < needed:
            raise ValueError("missing RST marker in entropy data")
        ncomp = len(scan)
        # block templates in scalar MCU order: per component, vy-major
        templates = []
        for ci, (c, _, _) in enumerate(scan):
            nv = c.v if ncomp > 1 else 1
            nh = c.h if ncomp > 1 else 1
            templates.extend((ci, vy, hx) for vy in range(nv) for hx in range(nh))
        B = len(templates)
        # per-component coefficient regions in the global flat space
        offs = []
        for c, _, _ in scan:
            offs.append(self.coef_total)
            self.coef_total += c.bh * c.bw * 64
        self.jobs.append((job, offs))
        # vectorized base schedule for all (mcu, template) pairs
        m = np.arange(M, dtype=np.int64)
        my, mx = m // mcus_x, m % mcus_x
        cols = []
        dcs, acs, cis = [], [], []
        for ci, vy, hx in templates:
            c, td, ta = scan[ci]
            cv = c.v if ncomp > 1 else 1
            ch = c.h if ncomp > 1 else 1
            cols.append(
                (((my * cv + vy) * c.bw + (mx * ch + hx)) << 6) + offs[ci]
            )
            dcs.append(self._slot(job.huff[(0, td)], True) << 16)
            acs.append(self._slot(job.huff[(1, ta)], False) << 16)
            cis.append(ci)
        base_flat = np.stack(cols, axis=1).ravel()  # (M*B,) mcu-major
        dc_flat = np.tile(np.asarray(dcs, dtype=np.int64), M)
        ac_flat = np.tile(np.asarray(acs, dtype=np.int64), M)
        ci_flat = np.tile(np.asarray(cis, dtype=np.int64), M)
        # lanes
        for ln in range(needed):
            m0, m1 = ln * ri, min((ln + 1) * ri, M)
            seg = job.segments[ln]
            off = self._nbytes
            self._bufs.append(seg)
            self._bufs.append(_SEG_PAD)
            self._nbytes += len(seg) + len(_SEG_PAD)
            self.lane_bp0.append(off * 8)
            # scalar parity: bit_limit = (len(seg) + 2) * 8, segment-local
            self.lane_limit.append((off + len(seg) + 2) * 8)
            sl = slice(m0 * B, m1 * B)
            self._sb.append(base_flat[sl])
            self._sd.append(dc_flat[sl])
            self._sa.append(ac_flat[sl])
            self._sp.append(ci_flat[sl] + self.npred)
            self.lane_sched.append(self._sched_len)
            self.lane_nblk.append((m1 - m0) * B)
            self._sched_len += (m1 - m0) * B
            self.lane_pbase.append(self.npred)
            self.npred += ncomp

    @property
    def nlanes(self) -> int:
        return len(self.lane_bp0)

    # -- the lane engine --------------------------------------------------

    def run(self) -> None:
        """Decode every lane; fill c.zz on every job component and run
        the shared dequant+IDCT tail per scan."""
        # pool scratch (window table, schedules, coefficient space) is
        # arena-backed: at 8 bytes per entropy byte the window table was
        # the baseline engine's dominant fresh-page source, the same
        # zone-lock exposure the r8 probe diagnosed on the progressive
        # side (operators/arena.py)
        from tectonic_spark.operators.arena import get_arena

        arena = get_arena("jpeg_base")
        arena.reset()
        joined = b"".join(self._bufs)
        cat = np.frombuffer(joined, dtype=np.uint8)
        # 48-bit big-endian window at every BYTE: covers the worst-case
        # o(7) + code(16) + magnitude(15) = 38-bit span in ONE gather;
        # built Horner-style into the arena (zero transient int64 temps)
        W = arena.take(len(joined) - 5, np.int64)
        np.copyto(W, cat[:-5], casting="unsafe")
        for s in range(1, 6):
            W <<= 8
            W |= cat[s : s - 5] if s < 5 else cat[5:]
        bmax = len(W) - 1

        def cat_into(parts: list) -> np.ndarray:
            out = arena.take(sum(p.size for p in parts), np.int64)
            np.concatenate(parts, out=out)
            return out

        POOL = np.concatenate(self._luts)
        SB = cat_into(self._sb)
        SD = cat_into(self._sd)
        SA = cat_into(self._sa)
        SP = cat_into(self._sp)
        PRED = arena.zeros(self.npred, np.int64)

        bp = np.asarray(self.lane_bp0, dtype=np.int64)
        limit = np.asarray(self.lane_limit, dtype=np.int64)
        soff = np.asarray(self.lane_sched, dtype=np.int64)
        nblk = np.asarray(self.lane_nblk, dtype=np.int64)
        cnt = np.zeros(self.nlanes, dtype=np.int64)
        gi = soff  # schedule index of the current block
        base = SB.take(gi)
        tid = SD.take(gi)
        acb = SA.take(gi)
        pidx = SP.take(gi)
        predlane = PRED.take(pidx)
        k = np.zeros(self.nlanes, dtype=np.int64)
        isdc = np.ones(self.nlanes, dtype=bool)
        err_code = err_run = err_eof = False

        emit_pos: list[np.ndarray] = []
        emit_val: list[np.ndarray] = []
        # Every lane in the state arrays is LIVE: finished lanes compact
        # out immediately (emission indices are global, so reindexing is
        # bookkeeping-free), which keeps the hot step mask-free and bounds
        # the tail-skew cost — steps with few surviving lanes run on
        # arrays of that size, not the original pool size. All step
        # arithmetic writes into preallocated scratch (out=): at typical
        # lane counts the allocator, not the ALU, dominates a numpy op.
        L = -1
        while True:
            if L != bp.size:  # (re)build scratch after compaction
                L = bp.size
                w, o, e = (np.empty(L, dtype=np.int64) for _ in range(3))
                adv, sz, run = (np.empty(L, dtype=np.int64) for _ in range(3))
                ext, val, kk = (np.empty(L, dtype=np.int64) for _ in range(3))
                t1, t2 = (np.empty(L, dtype=np.int64) for _ in range(2))
                szpos, emitm = (np.empty(L, dtype=bool) for _ in range(2))
                bendm, cond = (np.empty(L, dtype=bool) for _ in range(2))
            np.right_shift(bp, 3, out=t1)
            W.take(t1, out=w, mode="clip")  # clip: junk lanes never OOB
            np.bitwise_and(bp, 7, out=o)
            np.subtract(32, o, out=t1)
            np.right_shift(w, t1, out=t2)
            np.bitwise_and(t2, 0xFFFF, out=t2)
            np.add(tid, t2, out=t2)
            POOL.take(t2, out=e)
            np.bitwise_and(e, 31, out=adv)  # fused len + size
            np.right_shift(e, 5, out=sz)
            np.bitwise_and(sz, 15, out=sz)
            np.right_shift(e, 9, out=run)
            _EXT.take(sz, out=ext)
            np.add(o, adv, out=t1)
            np.subtract(48, t1, out=t1)  # magnitude bits land at 48-o-adv
            np.right_shift(w, t1, out=val)
            np.bitwise_and(val, ext, out=val)
            np.right_shift(ext, 1, out=t1)  # ext>>1 == half-1 (0 at sz=0)
            np.less_equal(val, t1, out=cond)
            np.subtract(val, ext, out=t1)
            np.copyto(val, t1, where=cond)  # magnitude-extend
            np.add(k, run, out=kk)  # run==0 on DC lanes -> kk==0
            np.add(predlane, val, out=t1)
            np.copyto(predlane, t1, where=isdc)
            np.greater(sz, 0, out=szpos)
            _ZIGPAD.take(kk, out=t1, mode="clip")
            np.add(base, t1, out=t1)
            np.logical_or(szpos, isdc, out=emitm)
            emit_pos.append(t1[emitm])
            np.copyto(val, predlane, where=isdc)
            emit_val.append(val[emitm])
            if not e.all():
                # e == 0 also forces adv=sz=run=0: an AC lane block-ends via
                # the EOB term below; a DC lane falls through to AC state at
                # the same bp and ends one step later — progress guaranteed
                err_code = True
            np.add(bp, adv, out=bp)
            np.add(kk, 1, out=k)
            np.greater(k, 64, out=cond)  # kk > 63: run past block end
            if cond.any() and (cond & szpos & ~isdc).any():
                err_run = True
            np.equal(run, 0, out=bendm)
            np.logical_not(emitm, out=cond)  # ~isdc & ~szpos
            np.logical_and(bendm, cond, out=bendm)
            np.greater(k, 63, out=cond)
            np.logical_or(bendm, cond, out=bendm)
            np.copyto(tid, acb, where=isdc)
            isdc[:] = False
            if bendm.any():
                T = np.nonzero(bendm)[0]
                PRED[pidx[T]] = predlane[T]
                if (bp[T] > limit[T]).any():
                    err_eof = True
                cT = cnt[T] + 1
                done = cT >= nblk[T]
                if done.any():
                    keep = np.ones(bp.size, dtype=bool)
                    keep[T[done]] = False
                    if not keep.any():
                        break
                    live = T[~done]
                    cnt[live] = cT[~done]
                    g = soff[live] + cT[~done]
                    base[live] = SB.take(g)
                    tid[live] = SD.take(g)
                    acb[live] = SA.take(g)
                    p = SP.take(g)
                    pidx[live] = p
                    predlane[live] = PRED.take(p)
                    k[live] = 0
                    isdc[live] = True
                    s = np.nonzero(keep)[0]
                    bp, limit, soff, nblk = bp[s], limit[s], soff[s], nblk[s]
                    cnt, base, tid, acb = cnt[s], base[s], tid[s], acb[s]
                    pidx, predlane, k = pidx[s], predlane[s], k[s]
                    isdc = isdc[s]
                else:
                    live = T
                    cnt[live] = cT
                    g = soff[live] + cT
                    base[live] = SB.take(g)
                    tid[live] = SD.take(g)
                    acb[live] = SA.take(g)
                    p = SP.take(g)
                    pidx[live] = p
                    predlane[live] = PRED.take(p)
                    k[live] = 0
                    isdc[live] = True
        if err_code:
            raise ValueError("invalid huffman code")
        if err_run:
            raise ValueError("AC run past block end")
        if err_eof:
            raise EOFError("entropy data exhausted")
        # float64 coefficient space from the arena too (c.zz views are
        # consumed by _scan_idct below, inside this call — nothing
        # aliases the arena after run() returns)
        flat = arena.zeros(self.coef_total, np.float64)
        if emit_pos:
            flat[np.concatenate(emit_pos)] = np.concatenate(emit_val)
        for job, offs in self.jobs:
            for (c, _, _), off in zip(job.scan, offs):
                nb = c.bh * c.bw
                c.zz = flat[off : off + nb * 64].reshape(-1, 64)
            _scan_idct(job.scan, job.qts)


def _job_eligible(job) -> bool:
    total = sum(len(s) for s in job.segments)
    if total < MIN_JOB_BYTES:
        return False
    M = job.mcus_x * job.mcus_y
    ri = job.ri if job.ri else M
    needed = (M + ri - 1) // ri
    if needed < MIN_JOB_LANES:
        return False
    sizes = [len(s) for s in job.segments[:needed]]
    return max(sizes) <= MAX_SEG_SKEW * (sum(sizes) / len(sizes))


# scratch-memory guard: the engine's 48-bit window table costs 8 bytes
# per entropy byte, so one pool is capped at ~64 MB of entropy data
# (~512 MB scratch) and larger Arrow batches run as sequential pools —
# same results, bounded executor memory.
POOL_BYTE_CAP = 64 * 1024 * 1024
# lane-count guard (r8, measured on the m14 dense-512x512 corpus): the
# per-step state arrays are O(lanes) and pools past the cache knee
# decode several times slower per image — and the knee is set by the
# SHARED LLC, so it tightens under executor concurrency: single-process
# 1.5-6.4k-lane pools all decode ~7 ms/img (vs 14.3 at 128k), but at 32
# concurrent workers 1024-lane pools hold 8 ms/img where 4096-lane
# pools degrade to 21. Capped at the concurrent optimum; pools flush
# sequentially, same results.
MAX_POOL_LANES = 1024


def payload_rides_engine(data: bytes) -> bool:
    """True iff this payload alone satisfies every lockstep gate (its
    scans are baseline, dense, balanced, and carry >= MIN_LANES restart
    segments). Header + segment split only — no entropy decode — so
    callers can PIN engine routing in oracle-checked outputs."""
    jobs: list = []
    try:
        _, _, _, _, progressive = decode_jpeg(data, _collect=jobs)
    except (_LockstepIneligible, ValueError, EOFError, NotImplementedError):
        return False
    if progressive or not jobs or not all(_job_eligible(j) for j in jobs):
        return False
    lanes = 0
    for j in jobs:
        m = j.mcus_x * j.mcus_y
        ri = j.ri if j.ri else m
        lanes += (m + ri - 1) // ri
    return lanes >= MIN_LANES


def decode_jpeg_batch(payloads: list[bytes]) -> list[np.ndarray]:
    """Decode a batch of JPEG payloads, routing dense baseline images
    with balanced restart segments through pooled lockstep passes, dense
    progressive images through the progressive lane pool
    (jpeg_prog_lockstep.py), and everything else (thumbnails, sparse or
    few-image batches) through the scalar path. Pixel output is
    bit-identical to [decode_jpeg(p) for p in payloads]. Error
    semantics on MALFORMED streams carry the same caveat as the
    progressive module: the pooled engines raise one all-or-nothing
    error with fixed precedence (invalid-code before EOF), so on a
    batch containing differently-malformed payloads the exception
    type / raise point can differ from the scalar loop's
    first-failure order (same exception types, pinned by the error
    parity tests).

    INVARIANT (do not add catch-and-fallback here or around the pool
    runs): m14/m15 pin engine routing in their value-hashed outputs by
    recomputing the gate predicates (payload_rides_engine /
    payload_rides_prog_engine). Those pins stay meaningful only because
    an engine bug fails the query LOUDLY — a try/except falling back to
    the scalar path would turn them into tautologies and silently hide
    engine regressions (pinned by
    test_engine_exception_propagates_no_silent_fallback)."""
    ensure_flat_malloc()
    from tectonic_spark.operators.jpeg_prog_lockstep import (
        PROG_POOL_BYTE_CAP,
        _prog_image_eligible,
        run_prog_pool,
    )

    out: list = [None] * len(payloads)
    pool = _Pool()
    pool_bytes = 0
    pending: list[tuple[int, list, int, int]] = []  # i, comps, w, h
    prog_imgs: list[tuple] = []  # (i, comps, w, h, qts, jobs)
    prog_bytes = 0

    def flush() -> None:
        nonlocal pool, pool_bytes
        if pending:
            if pool.nlanes >= MIN_LANES:
                pool.run()
                for i, comps, w, h in pending:
                    out[i] = _assemble(comps, w, h)
            else:
                for i, _, _, _ in pending:
                    out[i] = decode_jpeg(payloads[i])
        pool = _Pool()
        pool_bytes = 0
        pending.clear()

    def flush_prog() -> None:
        nonlocal prog_bytes
        if prog_imgs:
            for i, px in run_prog_pool(prog_imgs, lambda i: payloads[i]):
                out[i] = px
        prog_imgs.clear()
        prog_bytes = 0

    for i, data in enumerate(payloads):
        jobs: list = []
        try:
            comps, w, h, qts, progressive = decode_jpeg(data, _collect=jobs)
        except _LockstepIneligible:
            out[i] = decode_jpeg(data)
            continue
        if progressive:
            if jobs and _prog_image_eligible(jobs):
                prog_imgs.append((i, comps, w, h, qts, jobs))
                prog_bytes += sum(
                    sum(len(s) for s in j.segments) for j in jobs
                )
                if prog_bytes >= PROG_POOL_BYTE_CAP:
                    flush_prog()
            else:
                out[i] = decode_jpeg(data)
            continue
        if not jobs or not all(_job_eligible(j) for j in jobs):
            out[i] = decode_jpeg(data)
            continue
        for j in jobs:
            pool.add_job(j)
            pool_bytes += sum(len(s) for s in j.segments)
        pending.append((i, comps, w, h))
        if pool_bytes >= POOL_BYTE_CAP or pool.nlanes >= MAX_POOL_LANES:
            flush()
    flush()
    flush_prog()
    return out

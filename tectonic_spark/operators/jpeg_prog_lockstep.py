"""Lockstep (lane-parallel) PROGRESSIVE JPEG entropy decode.

The scalar progressive decoder in jpeg.py (``_decode_scan_progressive``)
walks entropy tokens one at a time in Python — correct, but at
~0.26 MB/s/core on dense progressive streams (VERDICT r7's top named
scale-killer: real web crawls are progressive-heavy). This module
extends the lockstep recipe of jpeg_lockstep.py to the four progressive
scan machines of T.81 §G.2:

* **DC first** (Ss=0, Ah=0) — one fused huffman-symbol+magnitude step
  per block per lane, DC prediction chains per (lane, component);
* **DC refine** (Ss=0, Ah>0) — exactly one raw bit per block: decoded
  for a whole segment in ONE vectorized gather, no stepping at all;
* **AC first** (Ss>0, Ah=0) — one symbol per lane per step with
  EOB-run block skipping, band-bounded runs, and ``<< Al`` scaling;
* **AC refine** (Ss>0, Ah>0) — the serial-looking correction-bit walk
  is re-expressed as a two-state token machine (SYMBOL / BITS): the
  nonzero-history structure of every block is precomputed from the
  coefficient state with one (blocks x band) gather, so a run of r
  zero-history coefficients resolves to its stop position with ONE
  indexed lookup, and each correction bit is one lockstep token.

LANES are restart segments (whole scans when, as in the common case,
progressive streams carry no restart markers), so a corpus batch of N
images yields N lanes per DC pool and N x components x bands lanes per
AC pool. Scans of one image are sequential only where they touch the
same coefficient region, so the pool schedules scans in dependency
WAVES (stage k = number of prior same-region scans): every image's
stage-0 scans decode together, then every stage-1 scan, etc. Machines
within a wave touch disjoint coefficient regions by construction.

Bit-exactness is structural: the same ``_huff_lut`` tables, the same
magnitude-extend arithmetic, the same EOB-run and refinement semantics
as the scalar path (pinned token-for-token by
tests/test_jpeg_prog_lockstep.py batch==scalar equality incl. a
Hypothesis sweep), and the SHARED ``_prog_idct`` + ``_assemble`` tail.

Error semantics: like the baseline engine, malformed streams raise the
scalar path's exception types for the whole pool (the batch caller's
contract is all-or-nothing, mirroring ``[decode_jpeg(p) for p in ...]``
which raises on the first bad payload); the raise point may differ.

Reference parity note: the reference engine has no JPEG surface; this
module belongs to the beyond-reference multimodal family (m11/m15).

100 TB shape: payloads never leave the executor; one pool per Arrow
batch; scratch is O(entropy bytes x 8) for the 48-bit window table plus
O(total coefficients x 8) for the shared flat coefficient space, both
bounded by the pool byte caps (larger batches run as sequential pools).
"""
from __future__ import annotations

import numpy as np

from tectonic_spark.operators.jpeg import (
    _assemble,
    _huff_lut,
    _prog_idct,
    _SEG_PAD,
)

# ------------------------------------------------------------------ gates
# Lockstep only pays when many lanes amortize the per-step numpy cost;
# thresholds are measured on the local[32] host (ROUND8.md: dense
# 256x256 q85 successive=1 fixtures, 6 scan-lanes per restart-free
# image — 64 images 0.36 MB/s vs scalar 0.41, 128 images 0.56, 512
# images best-of-3 1.25): the crossover sits between 64 and 128 images
# = ~400-800 total scan-lanes. The gate counts LANES (restart segments
# x scans), not images, so a single restart-intervaled payload whose
# scans carry hundreds of segments rides the engine deterministically
# regardless of batch size (the m15 oracle pin).
MIN_PROG_LANES = 576
# per-image density gate: tiny progressive thumbnails stay scalar
MIN_IMG_BYTES = 2048
# entropy bytes per pool before a sequential flush (window table costs
# 8 bytes/entropy byte)
PROG_POOL_BYTE_CAP = 64 * 1024 * 1024
# flat coefficient scratch per sub-pool (int64; memory bound — refine
# structures add ~2-3x on top)
COEF_BYTE_CAP = 256 * 1024 * 1024
# lane-count guard (r8, measured across three corpus shapes AND under
# executor concurrency): per-step state arrays and per-wave builds are
# O(lanes), and the cache knee is set by the SHARED LLC — at 32
# concurrent workers the m15 dense-512x512 restart shape decodes at
# 32 ms/img in 2-4k-lane sub-pools vs 218 ms/img at 16k (single-
# process both are ~20 ms). The no-restart crawl shape (6 lanes/img)
# never nears the cap; 1024 is already per-pool-overhead-bound (40
# ms). Chunks flush at the cap; trailing chunks may be smaller.
MAX_PROG_POOL_LANES = 2048

# magnitude-extend table: EXT[s] = (1<<s)-1 (mask, subtrahend, and
# (>>1) threshold-1 — size-0 values never extend)
_EXT = np.array([(1 << s) - 1 for s in range(16)], dtype=np.int64)

_RAW_LUT_CACHE: dict[bytes, np.ndarray] = {}
_RAW_LUT_MAX = 512

# optional tuning telemetry: set to a dict to accumulate per-machine
# step counts (used by the gate-measurement harness; zero hot-loop cost
# when None)
_STATS: dict | None = None


def _lut_raw_np(raw: bytes) -> np.ndarray:
    """int64 view of the scalar 16-bit-lookahead LUT, UNFUSED:
    ``(run << 10) | (size << 5) | len`` — progressive AC symbols append
    either ``size`` magnitude bits, ``run`` EOB-extension bits, or one
    sign bit, so the advance is composed per step, not baked in."""
    hit = _RAW_LUT_CACHE.get(raw)
    if hit is None:
        hit = np.asarray(_huff_lut(raw), dtype=np.int64)
        if len(_RAW_LUT_CACHE) >= _RAW_LUT_MAX:
            # evict one arbitrary entry, not the whole dict: a clear()
            # here would also empty the refine cache's source tables and
            # trigger correlated full rebuilds on heterogeneous-table
            # corpora (ADVICE r8)
            _RAW_LUT_CACHE.popitem()
        _RAW_LUT_CACHE[raw] = hit
    return hit


_REFINE_LUT_CACHE: dict[bytes, np.ndarray] = {}


def _lut_refine_np(raw: bytes) -> np.ndarray:
    """AC-refine LUT with per-symbol classification FUSED at build time
    (one table pass instead of ~10 per-step ops): bits 0-5 the full bit
    advance (code length + appended-bit count), bits 6-7 the kind
    (0=EOB, 1=ZRL, 2=newly-nonzero coefficient, 3=invalid refinement
    size >1 — rides the EOB path for guaranteed progress), bits 8-11 the
    run nibble, bits 16-30 the appended-bit extraction mask. Entry 0 is
    only ever an invalid prefix (legal entries carry adv >= 1)."""
    hit = _REFINE_LUT_CACHE.get(raw)
    if hit is None:
        v = _lut_raw_np(raw)
        ln_ = v & 31
        sz = (v >> 5) & 31
        run = v >> 10
        kind = np.where(sz == 1, 2, np.where(sz == 0, np.where(run == 15, 1, 0), 3))
        w2 = np.where(kind == 2, 1, np.where(kind == 0, run, 0))
        mask = (np.int64(1) << w2) - 1
        hit = (mask << 16) | (run << 8) | (kind << 6) | (ln_ + w2)
        hit = np.where(v == 0, 0, hit)
        if len(_REFINE_LUT_CACHE) >= _RAW_LUT_MAX:
            _REFINE_LUT_CACHE.popitem()  # single eviction, see _lut_raw_np
        _REFINE_LUT_CACHE[raw] = hit
    return hit


# ----------------------------------------------------------------- arena
# Grow-only per-thread scratch for the per-chunk builders (the r8 sf10
# page-allocator finding — see operators/arena.py for the full story):
# FLAT and the AC-refine structure/nonzero arrays were ~12 MB/img of
# fresh faulted pages per image at 32-way; they now bump-allocate from
# buffers bounded by COEF_BYTE_CAP + the ~2-3x structure footprint.
from tectonic_spark.operators.arena import get_arena


def _arena():
    return get_arena("jpeg_prog")


def _flatnonzero_into(flat: np.ndarray, n: int, arena) -> np.ndarray:
    """Row-major flatnonzero of a bool array into int32 arena scratch
    (indices < COEF_BYTE_CAP/8 < 2^31 by the pool cap). The input is
    walked in sub-mmap-threshold chunks so np.flatnonzero's temporaries
    are served from the heap fastpath instead of fresh kernel pages
    (the whole point of the arena)."""
    out = arena.take(n, np.int32)
    step = 1 << 13  # 8k bools per call -> <=64 KB temporary
    pos = 0
    for i in range(0, flat.size, step):
        idx = np.flatnonzero(flat[i : i + step])
        k = idx.size
        if k:
            np.add(idx, i, out=out[pos : pos + k], casting="unsafe")
            pos += k
    return out


def _cat_into(parts: list, n: int, dtype, arena) -> np.ndarray:
    out = arena.take(n, dtype)
    if parts:
        np.concatenate(parts, out=out)
    return out


def _job_units(job) -> tuple[int, int, int]:
    """(units_x, units_y, blocks_per_unit) of a progressive scan — the
    scalar path's unit grid: interleaved MCUs for multi-component scans,
    the sole component's non-interleaved grid otherwise."""
    if len(job.scan) == 1:
        c = job.scan[0][0]
        ni_w = ((job.width * c.h + job.h_max - 1) // job.h_max + 7) // 8
        ni_h = ((job.height * c.v + job.v_max - 1) // job.v_max + 7) // 8
        return ni_w, ni_h, 1
    bpu = sum(c.h * c.v for c, _, _ in job.scan)
    return job.mcus_x, job.mcus_y, bpu


def _job_kind(job) -> str:
    if job.ss == 0:
        return "dcf" if job.ah == 0 else "dcr"
    return "acf" if job.ah == 0 else "acr"


def _lane_split(job) -> tuple[int, int, int]:
    """(units, ri_units, n_lanes) — restart-interval lane split over the
    scan's unit grid; raises the scalar path's error when segments are
    missing."""
    ux, uy, _ = _job_units(job)
    units = ux * uy
    ri = job.ri if job.ri else units
    needed = (units + ri - 1) // ri
    if len(job.segments) < needed:
        raise ValueError("missing RST marker in entropy data")
    return units, ri, needed


def _image_lanes(jobs: list) -> int:
    """Total restart-segment lanes this image contributes across all of
    its scans' machine pools."""
    return sum(_lane_split(j)[2] for j in jobs)


def _prog_image_eligible(jobs: list) -> bool:
    """True iff every captured scan of the image is engine-decodable
    (valid scan shapes, enough restart segments) and the image is dense
    enough to pay for pooling. Invalid streams route scalar so the
    scalar path raises its exact error."""
    total = 0
    for j in jobs:
        if j.ss > 0 and len(j.scan) != 1:
            return False  # scalar raises "AC progressive scan must be ..."
        if j.ss > 0 and (j.se > 63 or j.ss > j.se):
            return False
        if j.ah > 0 and j.ah != j.al + 1:
            # nonstandard successive approximation chain: keep scalar
            return False
        try:
            _lane_split(j)
        except ValueError:
            return False
        total += sum(len(s) for s in j.segments)
    return total >= MIN_IMG_BYTES


# ---------------------------------------------------------------- window


class _Entropy:
    """Concatenated padded segments of one machine pool + the 48-bit
    big-endian byte-window table (code peek + appended bits in one
    gather, as in the baseline engine)."""

    def __init__(self) -> None:
        self._bufs: list[bytes] = []
        self.nbytes = 0
        self.W: np.ndarray | None = None

    def add(self, seg: bytes) -> tuple[int, int]:
        """Append one segment; returns (bit_offset, bit_limit) — the
        scalar parity limit is (len(seg) + 2) * 8, segment-local."""
        off = self.nbytes
        self._bufs.append(seg)
        self._bufs.append(_SEG_PAD)
        self.nbytes += len(seg) + len(_SEG_PAD)
        return off * 8, (off + len(seg) + 2) * 8

    def add_many(self, segs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
        """Append a job's segments in one pass; returns vectorized
        (bit_offsets, bit_limits) — identical accounting to per-lane
        add() without the per-lane Python loop (the builders' dominant
        cost at hundreds of segments per scan)."""
        lens = np.fromiter((len(s) for s in segs), dtype=np.int64, count=len(segs))
        offs = self.nbytes + np.concatenate(
            [[0], np.cumsum(lens[:-1] + len(_SEG_PAD))]
        )
        for s in segs:
            self._bufs.append(s)
            self._bufs.append(_SEG_PAD)
        self.nbytes += int(lens.sum()) + len(_SEG_PAD) * len(segs)
        return offs * 8, (offs + lens + 2) * 8

    def build(self) -> np.ndarray:
        cat = np.frombuffer(b"".join(self._bufs), dtype=np.uint8).astype(np.int64)
        self.W = (
            (cat[:-5] << 40)
            | (cat[1:-4] << 32)
            | (cat[2:-3] << 24)
            | (cat[3:-2] << 16)
            | (cat[4:-1] << 8)
            | cat[5:]
        )
        return self.W


# ------------------------------------------------------------- DC first


def _run_dc_first(items: list, FLAT: np.ndarray) -> None:
    """items: (job, comp_offs) — comp_offs[i] is the flat coefficient
    offset of scan component i. One fused symbol per block per lane."""
    ent = _Entropy()
    luts: list[np.ndarray] = []
    lut_slot: dict[bytes, int] = {}

    def slot(raw: bytes) -> int:
        s = lut_slot.get(raw)
        if s is None:
            s = len(luts)
            lut_slot[raw] = s
            # DC decode ignores the run nibble: mask it so corrupt DC
            # symbols with a nonzero high nibble stay scalar-exact
            luts.append(_lut_raw_np(raw) & 0x3FF)
        return s

    sched_pos: list[np.ndarray] = []  # flat DC coefficient position
    sched_lut: list[np.ndarray] = []
    sched_pred: list[np.ndarray] = []
    sched_len = 0
    lane_bp0: list[np.ndarray] = []
    lane_limit: list[np.ndarray] = []
    lane_s0: list[np.ndarray] = []
    lane_nblk: list[np.ndarray] = []
    lane_al: list[np.ndarray] = []
    npred = 0

    for job, offs in items:
        ux_n, uy_n, _ = _job_units(job)
        units, ri, needed = _lane_split(job)
        ncomp = len(job.scan)
        m = np.arange(units, dtype=np.int64)
        uy, ux = m // ux_n, m % ux_n
        cols, lslots, cis = [], [], []
        for ci, (c, td, _) in enumerate(job.scan):
            nv = c.v if ncomp > 1 else 1
            nh = c.h if ncomp > 1 else 1
            for vy in range(nv):
                for hx in range(nh):
                    if ncomp == 1:
                        bi = uy * c.bw + ux
                    else:
                        bi = (uy * c.v + vy) * c.bw + (ux * c.h + hx)
                    cols.append(offs[ci] + (bi << 6))
                    lslots.append(slot(job.huff[(0, td)]) << 16)
                    cis.append(ci)
        B = len(cols)
        # lane schedules are contiguous unit ranges, so the concatenated
        # per-lane slices ARE the flat arrays — no per-lane Python loop
        # (at 256 segments x 4 scans x hundreds of images the slice loop
        # dominated the build)
        sched_pos.append(np.stack(cols, axis=1).ravel())
        sched_lut.append(np.tile(np.asarray(lslots, dtype=np.int64), units))
        lane_of_unit = m // ri
        sched_pred.append(
            np.repeat(lane_of_unit * ncomp, B)
            + np.tile(np.asarray(cis, dtype=np.int64), units)
            + npred
        )
        bp0s, lims = ent.add_many(job.segments[:needed])
        lane_bp0.append(bp0s)
        lane_limit.append(lims)
        ln_ = np.arange(needed, dtype=np.int64)
        lane_s0.append(sched_len + ln_ * ri * B)
        lane_nblk.append((np.minimum((ln_ + 1) * ri, units) - ln_ * ri) * B)
        sched_len += units * B
        lane_al.append(np.full(needed, job.al, dtype=np.int64))
        npred += needed * ncomp

    W = ent.build()
    POOL = np.concatenate(luts)
    SPOS = np.concatenate(sched_pos)
    SLUT = np.concatenate(sched_lut)
    SPRED = np.concatenate(sched_pred)
    PRED = np.zeros(npred, dtype=np.int64)

    bp = np.concatenate(lane_bp0)
    limit = np.concatenate(lane_limit)
    s0 = np.concatenate(lane_s0)
    nblk = np.concatenate(lane_nblk)
    al = np.concatenate(lane_al)
    cnt = np.zeros(bp.size, dtype=np.int64)
    gi = s0.copy()
    pos = SPOS.take(gi)
    lut = SLUT.take(gi)
    pidx = SPRED.take(gi)
    err_code = err_eof = False

    emit_pos: list[np.ndarray] = []
    emit_val: list[np.ndarray] = []
    while bp.size:
        w = W.take(bp >> 3, mode="clip")
        o = bp & 7
        e = POOL.take(lut + ((w >> (32 - o)) & 0xFFFF))
        if not e.all():
            err_code = True  # e==0 -> zero advance, zero diff; the
            # per-step block end still guarantees progress
        ln_ = e & 31
        sz = (e >> 5) & 31
        adv = ln_ + sz
        ext = _EXT.take(sz & 15)
        bits = (w >> (48 - o - adv)) & ext
        val = np.where(bits <= (ext >> 1), bits - ext, bits)
        pred = PRED.take(pidx) + val
        PRED[pidx] = pred
        emit_pos.append(pos)
        emit_val.append(pred << al)
        bp = bp + adv
        if (bp > limit).any():
            err_eof = True
        # every step completes one block
        cnt += 1
        done = cnt >= nblk
        if done.any():
            keep = ~done
            if not keep.any():
                break
            s = np.nonzero(keep)[0]
            bp, limit, s0, nblk, al, cnt = (
                bp[s], limit[s], s0[s], nblk[s], al[s], cnt[s],
            )
        gi = s0 + cnt
        pos = SPOS.take(gi)
        lut = SLUT.take(gi)
        pidx = SPRED.take(gi)
    if err_code:
        raise ValueError("invalid huffman code")
    if err_eof:
        raise EOFError("entropy data exhausted")
    FLAT[np.concatenate(emit_pos)] = np.concatenate(emit_val)


# ------------------------------------------------------------ DC refine


def _run_dc_refine(items: list, FLAT: np.ndarray) -> None:
    """Exactly one raw bit per block: decoded per segment in one
    vectorized gather — no stepping."""
    for job, offs in items:
        ux_n, uy_n, _ = _job_units(job)
        units, ri, needed = _lane_split(job)
        ncomp = len(job.scan)
        m = np.arange(units, dtype=np.int64)
        uy, ux = m // ux_n, m % ux_n
        cols = []
        for ci, (c, _, _) in enumerate(job.scan):
            nv = c.v if ncomp > 1 else 1
            nh = c.h if ncomp > 1 else 1
            for vy in range(nv):
                for hx in range(nh):
                    if ncomp == 1:
                        bi = uy * c.bw + ux
                    else:
                        bi = (uy * c.v + vy) * c.bw + (ux * c.h + hx)
                    cols.append(offs[ci] + (bi << 6))
        B = len(cols)
        pos_flat = np.stack(cols, axis=1).ravel()
        # all segments in one pass: concatenated padded buffers + per-
        # segment byte offsets, one vectorized bit gather for the job
        segs = job.segments[:needed]
        lens = np.fromiter((len(s) for s in segs), dtype=np.int64, count=needed)
        ln_ = np.arange(needed, dtype=np.int64)
        seg_blocks = (np.minimum((ln_ + 1) * ri, units) - ln_ * ri) * B
        if (seg_blocks > (lens + 2) * 8).any():
            raise EOFError("entropy data exhausted")
        soff = np.concatenate([[0], np.cumsum(lens + len(_SEG_PAD))])[:-1]
        cat = np.frombuffer(
            b"".join(s + _SEG_PAD for s in segs), dtype=np.uint8
        )
        t = np.arange(units * B, dtype=np.int64)
        seg_of = (t // B) // ri
        local = t - seg_of * ri * B
        bp = soff.take(seg_of) * 8 + local
        bit = (cat[bp >> 3].astype(np.int64) >> (7 - (bp & 7))) & 1
        FLAT[pos_flat] = FLAT[pos_flat] | (bit << job.al)


# ------------------------------------------------------------- AC first


def _run_ac_first(items: list, FLAT: np.ndarray) -> None:
    """One symbol per lane per step: band-bounded runs, EOB-run block
    skipping (skipped blocks consume nothing), ``<< Al`` scaling."""
    ent = _Entropy()
    luts: list[np.ndarray] = []
    lut_slot: dict[bytes, int] = {}

    def slot(raw: bytes) -> int:
        s = lut_slot.get(raw)
        if s is None:
            s = len(luts)
            lut_slot[raw] = s
            luts.append(_lut_raw_np(raw))
        return s

    sched_base: list[np.ndarray] = []
    sched_len = 0
    lane_bp0, lane_limit, lane_s0, lane_nblk = [], [], [], []
    lane_ss, lane_se, lane_al, lane_lut = [], [], [], []

    for job, offs in items:
        c, _, ta = job.scan[0]
        ux_n, uy_n, _ = _job_units(job)
        units, ri, needed = _lane_split(job)
        m = np.arange(units, dtype=np.int64)
        bi = (m // ux_n) * c.bw + (m % ux_n)
        sched_base.append(offs[0] + (bi << 6))  # per-lane slices == whole
        lslot = slot(job.huff[(1, ta)]) << 16
        bp0s, lims = ent.add_many(job.segments[:needed])
        lane_bp0.append(bp0s)
        lane_limit.append(lims)
        ln_ = np.arange(needed, dtype=np.int64)
        lane_s0.append(sched_len + ln_ * ri)
        lane_nblk.append(np.minimum((ln_ + 1) * ri, units) - ln_ * ri)
        sched_len += units
        lane_ss.append(np.full(needed, job.ss, dtype=np.int64))
        lane_se.append(np.full(needed, job.se, dtype=np.int64))
        lane_al.append(np.full(needed, job.al, dtype=np.int64))
        lane_lut.append(np.full(needed, lslot, dtype=np.int64))

    W = ent.build()
    POOL = np.concatenate(luts)
    SBASE = np.concatenate(sched_base)

    bp = np.concatenate(lane_bp0)
    limit = np.concatenate(lane_limit)
    s0 = np.concatenate(lane_s0)
    nblk = np.concatenate(lane_nblk)
    ss = np.concatenate(lane_ss)
    se = np.concatenate(lane_se)
    al = np.concatenate(lane_al)
    lut = np.concatenate(lane_lut)
    cnt = np.zeros(bp.size, dtype=np.int64)
    base = SBASE.take(s0)
    k = ss.copy()
    err_code = err_run = err_eof = False

    emit_pos: list[np.ndarray] = []
    emit_val: list[np.ndarray] = []
    while bp.size:
        w = W.take(bp >> 3, mode="clip")
        o = bp & 7
        e = POOL.take(lut + ((w >> (32 - o)) & 0xFFFF))
        if not e.all():
            err_code = True  # e==0 -> EOB-shaped with run 0: eobrun=0,
            # block ends, progress guaranteed
        ln_ = e & 31
        sz = (e >> 5) & 31
        run = e >> 10
        szpos = sz > 0
        eobm = ~szpos & (run < 15)
        zrlm = ~szpos & (run == 15)
        w2 = np.where(szpos, sz, np.where(eobm, run, 0))
        adv = ln_ + w2
        bits = (w >> (48 - o - adv)) & ((np.int64(1) << w2) - 1)
        ext = _EXT.take(sz & 15)
        val = np.where(bits <= (ext >> 1), bits - ext, bits)
        kk = k + run
        bad = szpos & (kk > se)
        if bad.any():
            err_run = True  # scalar: "AC run past band end"
        emitm = szpos & ~bad
        if emitm.any():
            emit_pos.append((base + kk)[emitm])
            emit_val.append((val << al)[emitm])
        k = np.where(szpos, kk + 1, np.where(zrlm, k + 16, k))
        bp = bp + adv
        eobrun = np.where(eobm, (np.int64(1) << run) - 1 + bits, 0)
        bend = eobm | (k > se) | bad
        if bend.any():
            T = np.nonzero(bend)[0]
            if (bp[T] > limit[T]).any():
                err_eof = True
            cT = np.minimum(cnt[T] + 1 + eobrun[T], nblk[T])
            done = cT >= nblk[T]
            if done.any():
                keep = np.ones(bp.size, dtype=bool)
                keep[T[done]] = False
                if not keep.any():
                    break
                live = T[~done]
                cnt[live] = cT[~done]
                base[live] = SBASE.take(s0[live] + cT[~done])
                k[live] = ss[live]
                s = np.nonzero(keep)[0]
                bp, limit, s0, nblk, cnt = bp[s], limit[s], s0[s], nblk[s], cnt[s]
                ss, se, al, lut, base, k = ss[s], se[s], al[s], lut[s], base[s], k[s]
            else:
                cnt[T] = cT
                base[T] = SBASE.take(s0[T] + cT)
                k[T] = ss[T]
    if err_code:
        raise ValueError("invalid huffman code")
    if err_run:
        raise ValueError("AC run past band end")
    if err_eof:
        raise EOFError("entropy data exhausted")
    if emit_pos:
        FLAT[np.concatenate(emit_pos)] = np.concatenate(emit_val)


# ------------------------------------------------------------ AC refine


def _run_ac_refine(items: list, FLAT: np.ndarray) -> None:
    """Two-state token machine (SYMBOL / BITS). The nonzero-history
    structure of every block — fixed for positions ahead of the cursor,
    since refinement never revisits a position — is precomputed from
    FLAT with one (blocks x band) gather per job, so a run of r
    zero-history coefficients resolves to its stop position, its val
    placement slot, and the number of interleaved correction bits with
    single indexed lookups. Each correction bit is one lockstep token."""
    ent = _Entropy()
    luts: list[np.ndarray] = []
    lut_slot: dict[bytes, int] = {}

    def slot(raw: bytes) -> int:
        s = lut_slot.get(raw)
        if s is None:
            s = len(luts)
            lut_slot[raw] = s
            luts.append(_lut_refine_np(raw))
        return s

    # pool-global structure arrays
    nzp_parts: list[np.ndarray] = []  # flat coef positions, nonzero history
    zk_parts: list[np.ndarray] = []  # band index of each zero-history pos
    zflat_parts: list[np.ndarray] = []  # flat coef position of same
    znz_parts: list[np.ndarray] = []  # global nz index reached at that zero
    # per-block schedule arrays
    sb_n0, sb_ne, sb_z0, sb_ze = [], [], [], []
    sched_len = 0
    nzp_len = 0
    z_len = 0
    lane_bp0, lane_limit, lane_s0, lane_nblk = [], [], [], []
    lane_se, lane_p1, lane_lut = [], [], []

    arena = _arena()
    for job, offs in items:
        c, _, ta = job.scan[0]
        ux_n, uy_n, _ = _job_units(job)
        units, ri, needed = _lane_split(job)
        nb = job.se - job.ss + 1
        m = np.arange(units, dtype=np.int64)
        bi = (m // ux_n) * c.bw + (m % ux_n)
        # band VIEW of the job's coefficient region, then row gathers —
        # no (U, B) int64 position matrix, no FLAT.take over it (the
        # structure build is the refine machine's main memory traffic).
        #
        # Two builder strategies, chosen per job by structure size:
        # SMALL jobs (the no-restart crawl shape — hundreds of modest
        # refine jobs per chunk) take the direct path, whose fresh
        # temporaries are all sub-mmap-threshold (heap-served, never
        # the kernel — the r8 fault storm came only from multi-MB
        # allocations) and which avoids the arena path's per-job
        # constant cost (measured: the 192-image crawl-shape pool ran
        # ~40% slower with the arena path applied to every job). LARGE
        # jobs (m15's dense restart-laned shape) build on int32/int8/
        # bool arena scratch with out= ops and sub-threshold chunked
        # gathers, so steady-state decode faults no fresh pages.
        region = FLAT[offs[0] : offs[0] + c.bh * c.bw * 64].reshape(-1, 64)
        bandv = region[:, job.ss : job.se + 1]
        cells = units * nb
        base_pos = (offs[0] + (bi << 6) + job.ss).astype(np.int32)
        if cells <= (1 << 16):
            # ---- direct small-job path (temps < 64k cells) ----------
            V = bandv[bi]
            nzm = V != 0
            nzcnt = nzm.sum(axis=1)
            zcnt = nb - nzcnt
            n0 = nzp_len + np.concatenate([[0], np.cumsum(nzcnt)])
            z0 = z_len + np.concatenate([[0], np.cumsum(zcnt)])
            zrows, zcols = np.nonzero(~nzm)
            zflat_parts.append(
                base_pos.take(zrows) + zcols.astype(np.int32)
            )
            zk_parts.append((zcols + job.ss).astype(np.int8))
            if nzm.any():
                nrows, ncols = np.nonzero(nzm)
                nzp_parts.append(
                    base_pos.take(nrows) + ncols.astype(np.int32)
                )
                cs = np.cumsum(nzm, axis=1, dtype=np.int32)
                znz_parts.append(
                    n0[:-1].astype(np.int32)[zrows] + cs[zrows, zcols]
                )
            else:
                znz_parts.append(n0[:-1].astype(np.int32).take(zrows))
        else:
            # ---- arena large-job path -------------------------------
            nzm = arena.take(cells, np.bool_).reshape(units, nb)
            rstep = max(1, (1 << 13) // nb)
            for r0 in range(0, units, rstep):
                np.not_equal(
                    bandv.take(bi[r0 : r0 + rstep], axis=0),
                    0,
                    out=nzm[r0 : r0 + rstep],
                )
            nzcnt = nzm.sum(axis=1)
            zcnt = nb - nzcnt
            n0 = nzp_len + np.concatenate([[0], np.cumsum(nzcnt)])
            z0 = z_len + np.concatenate([[0], np.cumsum(zcnt)])
            zm = arena.take(cells, np.bool_).reshape(units, nb)
            np.logical_not(nzm, out=zm)
            zn = cells - int(nzcnt.sum())
            # int32 positions / counters: valid under COEF_BYTE_CAP
            # (< 2^31 flat entries per pool) and halving the structure
            # footprint — the zero-history side is ~band-dense, so
            # these arrays dominate pool scratch
            zidx = _flatnonzero_into(zm.ravel(), zn, arena)
            zrows = arena.take(zn, np.int32)
            np.floor_divide(zidx, nb, out=zrows)
            zcols = arena.take(zn, np.int32)
            np.remainder(zidx, nb, out=zcols)
            zf = arena.take(zn, np.int32)
            np.take(base_pos, zrows, out=zf)
            np.add(zf, zcols, out=zf)
            zflat_parts.append(zf)
            zk = arena.take(zn, np.int8)
            np.add(zcols, job.ss, out=zk, casting="unsafe")
            zk_parts.append(zk)
            n032 = n0[:-1].astype(np.int32)
            znz = arena.take(zn, np.int32)
            if nzm.any():
                nn = cells - zn
                nidx = _flatnonzero_into(nzm.ravel(), nn, arena)
                nrows = arena.take(nn, np.int32)
                np.floor_divide(nidx, nb, out=nrows)
                nzp = arena.take(nn, np.int32)
                np.take(base_pos, nrows, out=nzp)
                np.add(nzp, nidx, out=nzp)
                # += ncols without materializing: ncols = nidx - nrows*nb
                np.subtract(nzp, nrows * np.int32(nb), out=nzp)
                nzp_parts.append(nzp)
                # inclusive cumsum at a zero counts nz strictly before
                cs = arena.take(cells, np.int32).reshape(units, nb)
                np.cumsum(nzm, axis=1, dtype=np.int32, out=cs)
                np.take(n032, zrows, out=znz)
                csg = arena.take(zn, np.int32)
                np.take(cs.reshape(-1), zidx, out=csg)
                np.add(znz, csg, out=znz)
            else:
                # all-invisible band (the sparse-corpus common case)
                np.take(n032, zrows, out=znz)
            znz_parts.append(znz)
        nzp_len = int(n0[-1])
        z_len = int(z0[-1])
        lslot = slot(job.huff[(1, ta)]) << 16
        # per-lane slices of the block tables concatenate back to the
        # whole arrays — append once, no per-lane loop
        sb_n0.append(n0[:-1])
        sb_ne.append(n0[1:])
        sb_z0.append(z0[:-1])
        sb_ze.append(z0[1:])
        bp0s, lims = ent.add_many(job.segments[:needed])
        lane_bp0.append(bp0s)
        lane_limit.append(lims)
        ln_ = np.arange(needed, dtype=np.int64)
        lane_s0.append(sched_len + ln_ * ri)
        lane_nblk.append(np.minimum((ln_ + 1) * ri, units) - ln_ * ri)
        sched_len += units
        lane_se.append(np.full(needed, job.se, dtype=np.int64))
        lane_p1.append(np.full(needed, 1 << job.al, dtype=np.int64))
        lane_lut.append(np.full(needed, lslot, dtype=np.int64))

    W = ent.build()
    POOL = np.concatenate(luts)
    NZP = _cat_into(nzp_parts, nzp_len, np.int32, arena)
    ZK = _cat_into(zk_parts, z_len, np.int8, arena)
    ZFLAT = _cat_into(zflat_parts, z_len, np.int32, arena)
    ZNZ = _cat_into(znz_parts, z_len, np.int32, arena)
    BN0 = _cat_into(sb_n0, sched_len, np.int64, arena)
    BNE = _cat_into(sb_ne, sched_len, np.int64, arena)
    BZ0 = _cat_into(sb_z0, sched_len, np.int64, arena)
    BZE = _cat_into(sb_ze, sched_len, np.int64, arena)

    bp = np.concatenate(lane_bp0)
    limit = np.concatenate(lane_limit)
    s0 = np.concatenate(lane_s0)
    nblk = np.concatenate(lane_nblk)
    se = np.concatenate(lane_se)
    p1 = np.concatenate(lane_p1)
    lut = np.concatenate(lane_lut)
    L = bp.size
    cnt = np.zeros(L, dtype=np.int64)
    gi = s0
    inbits = np.zeros(L, dtype=bool)  # False = SYMBOL state
    nzi = BN0.take(gi)
    nzlim = nzi.copy()  # unused until BITS
    zi = BZ0.take(gi)
    vpos = np.full(L, -1, dtype=np.int64)
    vval = np.zeros(L, dtype=np.int64)
    after_end = np.zeros(L, dtype=bool)
    eob_left = np.zeros(L, dtype=np.int64)

    lanes = np.arange(bp.size, dtype=np.int64)
    # error flags accumulate as lane-width arrays (OR per step is one
    # cheap op; .any() reductions per step cost ~2 us apiece x 4 x steps)
    errs = np.zeros(3, dtype=np.int64)  # code, size, eof
    # FLAT writes are DEFERRED to the end of the wave: every coefficient
    # position is touched at most once per scan (the cursor never
    # revisits a position) and every in-scan read — the nonzero-history
    # structure at build time and the (cv & p1) gathers below — is of
    # pre-scan state, so batching the scatter is order-exact and removes
    # two fancy-index writes from the hot step.
    out_pos: list[np.ndarray] = []
    out_val: list[np.ndarray] = []
    while bp.size:
        if _STATS is not None:
            _STATS["acr_steps"] = _STATS.get("acr_steps", 0) + 1
            _STATS["acr_lanesteps"] = _STATS.get("acr_lanesteps", 0) + bp.size
        symm = ~inbits
        g = s0 + cnt
        # ---- SYMBOL sub-step (masked commits, in-place ops) ----------
        if symm.any():
            o = bp & 7
            w = W.take(bp >> 3, mode="clip")
            e = POOL.take(lut + ((w >> (32 - o)) & 0xFFFF))
            errs[0] += ((e == 0) & symm).sum()  # e==0 -> EOB-shaped
            # (run 0): eobrun=1, tail consumes, block ends -> progress
            kind = (e >> 6) & 3
            run = (e >> 8) & 15
            coefm = symm & (kind == 2)
            errs[1] += (symm & (kind == 3)).sum()  # "bad refinement
            # size"; the lane rides the EOB path for guaranteed progress
            eobm = symm & ((kind == 0) | (kind == 3))
            zrlm = symm & (kind == 1)
            adv = e & 63
            bits = (w >> (48 - o - adv)) & (e >> 16)
            np.add(bp, adv, out=bp, where=symm)
            bne = BNE.take(g)
            # EOB: eobrun = (1 << r) + ext bits; current block consumes
            # its tail now, eob_left more blocks consume theirs on entry
            np.copyto(eob_left, (np.int64(1) << run) + bits - 1, where=eobm)
            np.copyto(nzlim, bne, where=eobm)
            np.copyto(vpos, -1, where=eobm)
            after_end |= eobm
            # coef (s==1) and ZRL share the run-resolution structure:
            # stop at the (r+1)-th zero-history position, consuming one
            # correction bit per nonzero-history position passed (the
            # ZRL run nibble is 15, so zi + run covers both)
            runm = coefm | zrlm
            zidx = zi + run
            ze = BZE.take(g)
            clamp = runm & (zidx >= ze)
            okm = runm & ~clamp
            zc = np.minimum(zidx, ze - 1)  # take(clip) floors negatives
            np.copyto(nzlim, ZNZ.take(zc, mode="clip"), where=okm)
            okc = okm & coefm
            np.copyto(vpos, ZFLAT.take(zc, mode="clip"), where=okc)
            np.copyto(vpos, -1, where=runm & ~okc)
            np.copyto(vval, np.where(bits != 0, p1, -p1), where=okc)
            np.copyto(zi, zidx + 1, where=okm)
            np.copyto(after_end, ZK.take(zc, mode="clip") >= se, where=okm)
            np.copyto(nzlim, bne, where=clamp)
            after_end |= clamp
            inbits |= eobm | runm
        # ---- RUN sub-step: every lane with a pending correction-bit
        # run consumes the WHOLE run in one ragged pass (np.repeat
        # flatten): symbol bits precede correction bits in-stream and bp
        # already advanced past them above. A run's positions are
        # distinct and its update decisions depend only on pre-scan
        # state, so the flattened gather is order-exact.
        fin = inbits.copy()
        if fin.any():
            cl = np.where(inbits, nzlim - nzi, 0)
            tot = int(cl.sum())
            if tot:
                rep = np.repeat(lanes[: cl.size], cl)
                starts = np.repeat(np.cumsum(cl) - cl, cl)
                j = np.arange(tot, dtype=np.int64) - starts
                gpos = NZP.take(nzi.take(rep) + j, mode="clip")
                gbp = bp.take(rep) + j
                wb = W.take(gbp >> 3, mode="clip")
                bit = (wb >> (47 - (gbp & 7))) & 1
                cv = FLAT.take(gpos)
                pp = p1.take(rep)
                upd = (bit == 1) & ((cv & pp) == 0)
                if upd.any():
                    out_pos.append(gpos[upd])
                    out_val.append(
                        cv[upd] + np.where(cv[upd] >= 0, pp[upd], -pp[upd])
                    )
                bp += cl
                nzi += cl
            place = fin & (vpos >= 0)
            if place.any():
                out_pos.append(vpos[place])
                out_val.append(vval[place])
                np.copyto(vpos, -1, where=place)
            inbits &= ~fin  # mid-block lanes resume SYMBOL
            # lanes with after_end: advance the block
            endm = fin & after_end
            if endm.any():
                errs[2] += (endm & (bp > limit)).sum()
                np.add(cnt, 1, out=cnt, where=endm)
                done = cnt >= nblk
                if done.any():
                    keep = ~done
                    if not keep.any():
                        break
                    s = np.nonzero(keep)[0]
                    bp, limit, s0, nblk, se, p1, lut, cnt = (
                        bp[s], limit[s], s0[s], nblk[s], se[s], p1[s], lut[s],
                        cnt[s],
                    )
                    inbits, nzi, nzlim, zi = inbits[s], nzi[s], nzlim[s], zi[s]
                    vpos, vval, after_end, eob_left = (
                        vpos[s], vval[s], after_end[s], eob_left[s],
                    )
                    endm = endm[s]
                # (re)enter the new block: EOB-run tail or fresh SYMBOL
                g = s0 + cnt
                tailm = endm & (eob_left > 0)
                freshm = endm & ~tailm
                np.copyto(nzi, BN0.take(g), where=endm)
                np.copyto(zi, BZ0.take(g), where=freshm)
                np.copyto(nzlim, BNE.take(g), where=tailm)
                np.subtract(eob_left, 1, out=eob_left, where=tailm)
                after_end |= tailm
                np.copyto(vpos, -1, where=endm)
                inbits |= tailm
    if out_pos:
        FLAT[np.concatenate(out_pos)] = np.concatenate(out_val)
    if errs[0]:
        raise ValueError("invalid huffman code")
    if errs[1]:
        raise ValueError("bad refinement size")
    if errs[2]:
        raise EOFError("entropy data exhausted")


# ------------------------------------------------------------- the pool


def run_prog_pool(images: list, scalar_payload) -> list[tuple[int, np.ndarray]]:
    """Decode a batch of collected progressive images through the wave
    scheduler. ``images``: (idx, comps, w, h, qts, jobs) tuples from
    decode_jpeg collect mode; ``scalar_payload(idx)`` returns the raw
    payload for the scalar fallback when the batch is below the lane
    gate. Returns (idx, pixels) pairs.

    Executor-memory bound: the flat coefficient space per sub-pool is
    capped at COEF_BYTE_CAP (refine structures add a comparable int32
    footprint), so oversized Arrow batches run as sequential sub-pools —
    same results, bounded scratch."""
    from tectonic_spark.operators.jpeg import decode_jpeg

    lanes = sum(_image_lanes(img[5]) for img in images)
    if lanes < MIN_PROG_LANES:
        return [(idx, decode_jpeg(scalar_payload(idx))) for idx, *_ in images]

    results: list[tuple[int, np.ndarray]] = []
    chunk: list = []
    nbytes = 0
    nlanes = 0
    for img in images:
        sz = sum(c.bh * c.bw * 64 * 8 for c in img[1])
        ln = _image_lanes(img[5])
        if chunk and (
            nbytes + sz > COEF_BYTE_CAP or nlanes + ln > MAX_PROG_POOL_LANES
        ):
            results.extend(_run_chunk(chunk))
            chunk, nbytes, nlanes = [], 0, 0
        chunk.append(img)
        nbytes += sz
        nlanes += ln
    if chunk:
        results.extend(_run_chunk(chunk))
    return results


def _run_chunk(images: list) -> list[tuple[int, np.ndarray]]:
    # flat coefficient space across all images (zigzag order, as the
    # scalar path's c.coef)
    total = 0
    img_offs: list[dict[int, int]] = []
    for _, comps, _, _, _, _ in images:
        offs: dict[int, int] = {}
        for c in comps:
            offs[id(c)] = total
            total += c.bh * c.bw * 64
        img_offs.append(offs)
    # FLAT and the runner builders draw from the grow-only per-worker
    # arena: the previous chunk's scratch is dead by now (results were
    # materialized by _assemble), so reset-and-overwrite is safe, and
    # steady-state chunks fault no fresh kernel pages (the r8 sf10
    # zone-lock finding)
    arena = _arena()
    arena.reset()
    FLAT = arena.zeros(total, np.int64)

    # stage assignment: a scan's stage = 1 + max stage of earlier scans
    # of the same image touching an overlapping coefficient region
    waves: dict[tuple[int, str], list] = {}
    maxstage = 0
    for (idx, comps, w, h, qts, jobs), offs in zip(images, img_offs):
        seen: list[tuple[set, int, int, int]] = []  # (cids, lo, hi, stage)
        for job in jobs:
            cids = {id(c) for c, _, _ in job.scan}
            lo, hi = (0, 0) if job.ss == 0 else (job.ss, job.se)
            st = 0
            for pcids, plo, phi, pst in seen:
                if (cids & pcids) and lo <= phi and plo <= hi:
                    st = max(st, pst + 1)
            seen.append((cids, lo, hi, st))
            maxstage = max(maxstage, st)
            comp_offs = [offs[id(c)] for c, _, _ in job.scan]
            waves.setdefault((st, _job_kind(job)), []).append((job, comp_offs))

    wave_mark = arena.mark()
    for st in range(maxstage + 1):
        for kind, runner in (
            ("dcf", _run_dc_first),
            ("dcr", _run_dc_refine),
            ("acf", _run_ac_first),
            ("acr", _run_ac_refine),
        ):
            items = waves.get((st, kind))
            if items:
                runner(items, FLAT)
                # each runner's structure scratch is dead once its FLAT
                # writes land; reclaim so a deep scan chain doesn't
                # accumulate per-wave builders in the arena
                arena.rewind(wave_mark)

    results = []
    for (idx, comps, w, h, qts, jobs), offs in zip(images, img_offs):
        for c in comps:
            off = offs[id(c)]
            nb = c.bh * c.bw
            c.coef = FLAT[off : off + nb * 64].reshape(nb, 64)
        _prog_idct(comps, qts)
        results.append((idx, _assemble(comps, w, h)))
    return results


def payload_rides_prog_engine(data: bytes) -> bool:
    """True iff this payload is progressive, engine-eligible, and rides
    the lane pool ON ITS OWN — its scans carry at least MIN_PROG_LANES
    restart segments, so the pool gate passes regardless of batch
    composition (a batch only ever ADDS lanes). Header + segment split
    only, no entropy decode, so callers can PIN engine routing in
    oracle-checked outputs (the m14 pattern)."""
    from tectonic_spark.operators.jpeg import _LockstepIneligible, decode_jpeg

    jobs: list = []
    try:
        _, _, _, _, progressive = decode_jpeg(data, _collect=jobs)
    except (_LockstepIneligible, ValueError, EOFError, NotImplementedError):
        return False
    return (
        progressive
        and bool(jobs)
        and _prog_image_eligible(jobs)
        and _image_lanes(jobs) >= MIN_PROG_LANES
    )

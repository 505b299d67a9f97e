"""Grow-only per-thread scratch arenas for the lockstep decode engines.

The r8 sf10 probe (SF10SPOT.md) diagnosed m15's residual
super-linearity to the page allocator: 32 concurrent workers each
faulting ~12 MB/img of FRESH numpy pages spend up to 29x more kernel
time per fault under sustained all-core load — zone-lock contention,
reproduced Spark-free (tools/prog_alloc_probe.py). Bump-allocating the
big per-chunk arrays from buffers that persist across sub-pools and
Arrow batches makes steady-state decode touch no fresh kernel pages:
``reset()`` rewinds the bump pointers and only semantically-zero arrays
are re-cleared (``.fill`` on resident pages is user-time memset).
Buffers grow to the largest chunk's footprint and stay bounded by the
engines' pool byte caps.

Shared by the progressive-JPEG lane engine (jpeg_prog_lockstep) and the
PNG wavefront pool (png).
"""

from __future__ import annotations

import threading

import numpy as np


class _Arena:
    __slots__ = ("_buf", "_used")

    def __init__(self) -> None:
        self._buf: dict[str, np.ndarray] = {}
        self._used: dict[str, int] = {}

    def reset(self) -> None:
        for k in self._used:
            self._used[k] = 0

    def mark(self) -> dict:
        return dict(self._used)

    def rewind(self, mark: dict) -> None:
        # rewind to a snapshot so each phase's scratch is reclaimed
        # within a chunk while earlier allocations stay live. If a
        # buffer was replaced (grew) since the mark, the rewound offset
        # is a harmless gap in the new buffer — never an overlap — and
        # the next reset() reclaims it.
        for k in self._used:
            self._used[k] = mark.get(k, 0)

    def take(self, n: int, dtype=np.int64) -> np.ndarray:
        n = int(n)
        k = np.dtype(dtype).char
        buf = self._buf.get(k)
        used = self._used.get(k, 0)
        if buf is None or used + n > buf.size:
            # live slices keep the old buffer alive until they die; the
            # arena moves to a larger one (grow-only, so the buffer set
            # converges after the first few chunks)
            cap = max(n, 2 * (buf.size if buf is not None else 1 << 15))
            buf = np.empty(cap, dtype=dtype)
            self._buf[k] = buf
            used = 0
        self._used[k] = used + n
        return buf[used : used + n]

    def zeros(self, n: int, dtype=np.int64) -> np.ndarray:
        out = self.take(n, dtype)
        out.fill(0)
        return out


_MALLOC_TUNED: bool | None = None


def ensure_flat_malloc(threshold: int = 128 << 20) -> bool:
    """Raise glibc's M_MMAP_THRESHOLD / M_TRIM_THRESHOLD once per
    process so the codec kernels' per-image buffers (raw inflate
    output, unfiltered rows, pixel planes — each a few hundred KB,
    above glibc's 128 KB mmap cutoff) recycle through the heap free
    list instead of mmap/munmap round-trips. Every munmap at 32-way
    IPIs the sibling workers for TLB shootdown; the r10 probe measured
    the PNG batch decode at 122 minor faults + 1.9-12.5 ms kernel per
    image steady-state with default thresholds vs 0 faults + 0.0 ms
    tuned (tools-free single-process numbers; the 32-way effect is the
    m17 sf10 storm this retires). Runtime ``mallopt`` via ctypes
    because the executor's Python workers are spawned by whatever
    harness owns the session — there is no env-var hook we control on
    every path. No-op (returns False) off glibc.

    Complements — does not replace — the grow-only arenas above: the
    arenas make the ENGINES' scratch allocation-free; this makes the
    remaining per-image output buffers kernel-free.
    """
    global _MALLOC_TUNED
    if _MALLOC_TUNED is not None:
        return _MALLOC_TUNED
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, threshold)) and bool(
            libc.mallopt(M_TRIM_THRESHOLD, threshold)
        )
    except (OSError, AttributeError):
        ok = False
    _MALLOC_TUNED = ok
    return ok


_TLS = threading.local()


def get_arena(name: str) -> _Arena:
    """Per-thread, per-engine arena (engines must not share bump state:
    their chunk lifetimes differ)."""
    store = getattr(_TLS, "arenas", None)
    if store is None:
        store = _TLS.arenas = {}
    a = store.get(name)
    if a is None:
        a = store[name] = _Arena()
    return a

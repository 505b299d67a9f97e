"""Spark-free repro of the m15 sf10 page-allocator contention (r8 finding).

32 forked workers each decode a stream of m15-shaped dense progressive
payloads through the lane engine, exactly as 32 concurrent mapInPandas
workers would. Reports per-worker USER and SYSTEM cpu per image plus
wall time — the r8 diagnosis was flat user cpu with ~29x kernel time
per fault under sustained all-core load (fresh numpy pages through the
page allocator's zone lock). A grow-only scratch arena should collapse
the system-time column.

Usage: python tools/prog_alloc_probe.py [n_workers] [images_per_worker]
"""
import os
import resource
import sys
import time


def _payload(d: int) -> bytes:
    import numpy as np

    from tectonic_spark.operators.jpeg import encode_jpeg_progressive

    bi = np.arange(4096, dtype=np.int64)
    vals = (2 * ((d * 11 + bi * 17) % 128)).astype(np.uint8).reshape(64, 64)
    plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    return encode_jpeg_progressive(
        plane, bands=((1, 63),), successive=1, restart_interval=16
    )


def _worker(payloads: list, n_imgs: int, out_fd: int) -> None:
    from tectonic_spark.operators.jpeg_lockstep import decode_jpeg_batch

    # warmup phase: arena growth + first-touch faulting happens here
    # (reported separately — the r9 arena makes steady state fault-free
    # while warmup still pays one-time first-touch costs)
    B = 8
    w0 = resource.getrusage(resource.RUSAGE_SELF)
    for _ in range(4):
        decode_jpeg_batch(payloads[:B])
    w1 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.monotonic()
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    done = 0
    while done < n_imgs:
        batch = [payloads[(done + i) % len(payloads)] for i in range(B)]
        pxs = decode_jpeg_batch(batch)
        assert len(pxs) == B and pxs[0].shape == (512, 512)
        done += B
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    wall = time.monotonic() - t0
    line = "%d %.3f %.3f %.3f %d %.3f %d\n" % (
        done,
        wall,
        r1.ru_utime - r0.ru_utime,
        r1.ru_stime - r0.ru_stime,
        r1.ru_minflt - r0.ru_minflt,
        w1.ru_stime - w0.ru_stime,
        w1.ru_minflt - w0.ru_minflt,
    )
    os.write(out_fd, line.encode())


def main() -> None:
    nw = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ni = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    # distinct payloads so LUT/header caches behave as in the real query
    payloads = [_payload(7 + 31 * i) for i in range(16)]
    rfd, wfd = os.pipe()
    t0 = time.monotonic()
    pids = []
    for _ in range(nw):
        pid = os.fork()
        if pid == 0:
            os.close(rfd)
            try:
                _worker(payloads, ni, wfd)
            finally:
                os._exit(0)
        pids.append(pid)
    os.close(wfd)
    lines = []
    with os.fdopen(rfd) as f:
        for line in f:
            lines.append(line.split())
    for pid in pids:
        os.waitpid(pid, 0)
    wall = time.monotonic() - t0
    tot = nw * ni
    usr = sum(float(x[2]) for x in lines)
    sysr = sum(float(x[3]) for x in lines)
    flt = sum(int(x[4]) for x in lines)
    wsys = sum(float(x[5]) for x in lines)
    wflt = sum(int(x[6]) for x in lines)
    print(
        "workers=%d imgs/worker=%d wall=%.2fs  steady per-img: "
        "user=%.1fms sys=%.1fms faults=%.1f | warmup/worker: "
        "sys=%.0fms faults=%d"
        % (
            nw,
            ni,
            wall,
            1000 * usr / tot,
            1000 * sysr / tot,
            flt / tot,
            1000 * wsys / nw,
            wflt // nw,
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()

"""Idle-host re-base of the engine sf10 ratios (VERDICT r9 item 1).

The r9 SF10SPOT rows for m15/m14/m17 rode sf1 bases measured while the
host load was decaying, flattering the ratios. This tool produces the
clean pair the verdict asked for: sf1 AND sf10 walls for the three
engine queries in ONE session, with the all-core canary measured at
BOTH ends and the run aborted (exit 3) unless both readings are within
--tolerance (default 5%) of the calibrated idle reference, plus
whole-host user/sys jiffies decomposition per run.

Usage: PYTHONPATH=. python tools/rebase_sf10.py [--tolerance 0.05]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = ["m15_jpeg_progressive_dense", "m14_jpeg_dense_decode", "m17_png_decode"]


def _jiffies() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user+nice, system+irq+softirq
    return int(parts[1]) + int(parts[2]), int(parts[3]) + int(parts[6]) + int(parts[7])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tolerance", type=float, default=0.05)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--wait-max", type=float, default=2400)
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    queries = args.names or QUERIES

    import bench
    from sf_scale import ensure_scaled

    idle_single, idle_par, calibrated = bench._canary_idle_ref()
    if not calibrated or not idle_par:
        print("no calibrated idle parallel canary on file; run "
              "tools/calibrate_canary.py on an idle host first")
        sys.exit(2)

    # the co-tenant pattern observed r10 is short bursts on a ~1 min
    # period: sample until a reading clears the gate (bounded wait),
    # requiring TWO consecutive clear readings so a burst trough
    # between bursts doesn't fake a window
    deadline = time.time() + args.wait_max
    par_start = None
    consecutive = 0
    while time.time() < deadline:
        c = bench._parallel_canary()
        ratio = c / idle_par
        print(f"canary sample: {c:.1f} ({100 * ratio:.1f}% of idle)",
              flush=True)
        # one-sided gate: a canary FASTER than the calibrated idle ref
        # cannot indicate co-tenant load (contamination only slows it);
        # readings above 1.0 are turbo/thermal variance in the
        # calibration itself, observed up to ~9% on this host
        if ratio >= 1 - args.tolerance:
            consecutive += 1
            par_start = c
            if consecutive >= 2:
                break
        else:
            consecutive = 0
        time.sleep(25)
    else:
        print(f"no idle window within {args.wait_max}s; aborting")
        sys.exit(3)
    ratio_start = par_start / idle_par
    print(f"parallel canary start: {par_start:.1f} "
          f"({100 * ratio_start:.1f}% of idle {idle_par:.1f})", flush=True)

    t0 = time.perf_counter()
    sf1 = ensure_scaled("/root/testdata/sf0.1", 10)
    sf10 = ensure_scaled("/root/testdata/sf0.1", 100)
    print(f"scaled dirs ready in {time.perf_counter() - t0:.1f}s", flush=True)

    import tectonic_spark.operators as ops
    from tectonic_spark import get_spark

    spark = get_spark(
        app_name="tectonic-rebase-sf10",
        extra_conf={"spark.sql.shuffle.partitions": "128"},
    )

    rows: dict[str, dict] = {}
    for name in queries:
        rows[name] = {}
        for label, sf_dir in (("sf1", sf1), ("sf10", sf10)):
            best = None
            for p in range(args.passes):
                u0, s0 = _jiffies()
                t0 = time.perf_counter()
                ops.REGISTRY[name].builder(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
                wall = time.perf_counter() - t0
                u1, s1 = _jiffies()
                run = {
                    "wall": round(wall, 2),
                    "user_j": u1 - u0,
                    "sys_j": s1 - s0,
                }
                print(f"{name} {label} pass{p}: {run}", flush=True)
                if best is None or run["wall"] < best["wall"]:
                    best = run
            rows[name][label] = best
        r1, r10 = rows[name]["sf1"]["wall"], rows[name]["sf10"]["wall"]
        rows[name]["ratio_vs_linear"] = round(r10 / (10 * r1), 2)
        print(f"{name}: sf1 {r1} s, sf10 {r10} s, "
              f"ratio {rows[name]['ratio_vs_linear']}", flush=True)

    spark.stop()
    time.sleep(2)  # let the JVM's threads drain before the end canary
    par_end = bench._parallel_canary()
    ratio_end = par_end / idle_par
    print(f"parallel canary end: {par_end:.1f} ({100 * ratio_end:.1f}% of idle)",
          flush=True)
    out = {
        "host": socket.gethostname(),
        "idle_parallel_ref": idle_par,
        "par_canary_start": par_start,
        "par_canary_end": par_end,
        "canary_within_tolerance": (
            ratio_start >= 1 - args.tolerance
            and ratio_end >= 1 - args.tolerance
        ),
        "tolerance": args.tolerance,
        "rows": rows,
    }
    print(json.dumps(out))
    if not out["canary_within_tolerance"]:
        sys.exit(3)


if __name__ == "__main__":
    main()

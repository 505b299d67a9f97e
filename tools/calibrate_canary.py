"""Calibrate the bench contention canary for THIS host.

Run on an IDLE host:  python tools/calibrate_canary.py [--sf-dir DIR]

Measures the single-thread pure-Python JSON full-parse rate (the same
measurement bench.py uses as its live canary) and records it per hostname
in .bench_canary_idle.json at the repo root. bench.py then normalizes its
headline against THIS host's idle rate instead of the hardcoded r4
judge-host constant, and marks the output host_canary_calibrated=true.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench

    stats = bench._skip_speedup(args.sf_dir)
    idle = stats["json_full_parse_mb_per_sec"]
    # r8: the all-core canary — records the machine's idle AGGREGATE
    # hash rate so bench runs can attribute headline moves to 32-core
    # co-tenancy the single-thread canary can't see
    par = bench._parallel_canary()

    path = os.path.join(REPO, ".bench_canary_idle.json")
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, ValueError):
        d = {}
    d[socket.gethostname()] = {"single": idle, "parallel": par}
    with open(path, "w") as f:
        json.dump(d, f, indent=2, sort_keys=True)
    print(
        f"calibrated {socket.gethostname()}: single {idle} MB/s, "
        f"parallel {par} MB/s -> {path}"
    )


if __name__ == "__main__":
    main()

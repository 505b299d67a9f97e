"""Optimization-round measurement harness (r13): per-query noop-sink
timing + formatted-plan capture for any registered query.

Usage:
  python tools/opt_measure.py --sf-dir /root/testdata/sf0.1 \
      [--repeats 3] [--plans-dir plans/r13] [--suffix before] names...

Prints one JSON line {name: {"sec": best, "passes": [...]}} and writes
``<plans-dir>/<name>_<suffix>.txt`` with the explain("formatted") output
plus a plan-shape summary (Exchange count, join nodes, Python eval nodes)
so before/after diffs are one `diff` away.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_summary(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "SortMergeJoin": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "BroadcastHashJoin": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "ShuffledHashJoin": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "BatchEvalPython": len(re.findall(r"\bBatchEvalPython\b", plan)),
        "ArrowEvalPython": len(re.findall(r"\bArrowEvalPython\b", plan)),
        "MapInPandas": len(re.findall(r"\bMapInPandas\b", plan)),
        "WholeStageCodegen": len(re.findall(r"WholeStageCodegen", plan)),
        "Sort": len(re.findall(r"\bSort\b", plan)),
    }
    return json.dumps(counts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true")
    # r14: persist-carrying builders reuse pass 1's cache blocks from pass
    # 2 on (CacheManager keys on the analyzed plan); clearing between
    # passes measures what a fresh run costs — same methodology as bench.py
    ap.add_argument("--clear-cache", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import tectonic_spark.operators as ops
    from tectonic_spark import get_spark
    from tectonic_spark.plans.explain import explain_str

    spark = get_spark(app_name="opt-measure")
    out: dict[str, dict] = {}
    for name in args.names:
        q = ops.REGISTRY[name]
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        df = q.builder(spark, args.sf_dir)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = explain_str(df, "formatted")
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(f"-- {name} @ {args.sf_dir} ({args.suffix})\n")
                f.write(f"-- shape: {plan_summary(plan)}\n\n")
                f.write(plan)
        if args.no_time:
            continue
        passes = []
        for _ in range(args.repeats):
            if args.clear_cache:
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.builder(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            passes.append(round(time.perf_counter() - t0, 3))
        out[name] = {"sec": min(passes), "passes": passes}
        print(f"## {name}: {min(passes)} {passes}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

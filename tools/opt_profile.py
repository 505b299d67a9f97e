"""Per-stage profile of one registered query: runs it once warm, then a
timed pass with the Spark UI enabled, and prints every stage's duration,
task count, shuffle bytes and input bytes from the UI REST API.

Usage: python tools/opt_profile.py --sf-dir DIR name [name...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import tectonic_spark.operators as ops
    from tectonic_spark import get_spark

    spark = get_spark(app_name="opt-profile", extra_conf={"spark.ui.enabled": "true"})
    base = "http://localhost:4040/api/v1"
    app_id = spark.sparkContext.applicationId

    for name in args.names:
        q = ops.REGISTRY[name]
        q.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        with urllib.request.urlopen(f"{base}/applications/{app_id}/stages") as r:
            before = {s["stageId"] for s in json.load(r)}
        t0 = time.perf_counter()
        q.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        with urllib.request.urlopen(f"{base}/applications/{app_id}/stages") as r:
            stages = [s for s in json.load(r) if s["stageId"] not in before]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n== {name}: wall {wall:.3f}s, {len(stages)} stages")
        for s in stages[:14]:
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                pass
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"runTime={s.get('executorRunTime', 0)/1000:7.2f}s "
                f"cpuTime={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                f"in={s.get('inputBytes', 0)>>20:>4}MB "
                f"sh_r={s.get('shuffleReadBytes', 0)>>20:>4}MB "
                f"sh_w={s.get('shuffleWriteBytes', 0)>>20:>4}MB  "
                f"{(s.get('name') or '')[:60]}"
            )


if __name__ == "__main__":
    main()

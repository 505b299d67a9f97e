"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via the noop sink (no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "b05_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "b04_range_join",
    "b07_topn_per_group",
    "b08_topk",
    "b11_tumbling_window",
    "b12_dedup_earliest",
    "c01_minhash_lsh",
    "c02_cosine_topk",
    "c03_token_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import tectonic_spark.operators as ops
    from tectonic_spark import get_spark

    spark = get_spark(app_name="tectonic-bench")
    # Warm the JVM/session with a trivial action so q1 isn't charged startup.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = ops.REGISTRY[name]
        t0 = time.perf_counter()
        q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

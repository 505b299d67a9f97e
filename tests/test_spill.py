"""Spill-under-memory-pressure evidence (VERDICT r4 item 6): the one
cluster behavior the 128 GiB sandbox never exercises on its own.

A SUBPROCESS SparkSession is launched with driver (== local-mode
executor) memory squeezed to 1 GiB and ``spark.memory.fraction`` cut to
0.1, then runs the heaviest exact-aggregation query (c01_line_dedup, the
MIN(struct) span-winner selection) over the 10x fact-scaled dataset.
The test asserts BOTH halves of the contract:

* the job COMPLETED and SPILLED — summed memory+disk spill bytes from
  the Spark UI REST stage metrics must be > 0 (otherwise the pressure
  knob regressed and the test is vacuous);
* the result is EXACT — an order-insensitive signature (row count +
  sum of murmur3 row hashes, deterministic across sessions) equals the
  same signature computed in the unconstrained test session.

SCALING.md (memory row) points here.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_SF_BASE = "/root/testdata/sf0.1"

_CHILD = r"""
import json, os, sys, urllib.request

os.environ["TECTONIC_DRIVER_MEM"] = "1g"
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tools"))
from sf_scale import ensure_scaled
from tectonic_spark import get_spark
import tectonic_spark.operators as ops
from pyspark.sql import functions as F

spark = get_spark(
    app_name="tectonic-spill-test",
    cpus=8,
    extra_conf={{
        "spark.memory.fraction": "0.1",
        "spark.sql.shuffle.partitions": "4",
        "spark.ui.enabled": "true",
        "spark.ui.port": "4049",
    }},
)
scaled = ensure_scaled({sf_base!r}, 10)
df = ops.REGISTRY["c01_line_dedup"].builder(spark, scaled)
sig = df.select(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.hash(*df.columns).cast("long")).alias("h"),
).collect()[0]
app_id = spark.sparkContext.applicationId
base = spark.sparkContext.uiWebUrl
stages = json.load(
    urllib.request.urlopen(f"{{base}}/api/v1/applications/{{app_id}}/stages")
)
spilled = sum(
    int(s.get("memoryBytesSpilled", 0)) + int(s.get("diskBytesSpilled", 0))
    for s in stages
)
print("SPILLSIG " + json.dumps({{"n": sig["n"], "h": sig["h"], "spilled": spilled}}))
spark.stop()
"""


@pytest.mark.slow
def test_line_dedup_exact_under_memory_pressure(spark):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from sf_scale import ensure_scaled

    scaled = ensure_scaled(_SF_BASE, 10)

    child = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=repo, sf_base=_SF_BASE)],
        capture_output=True,
        text=True,
        timeout=1200,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert child.returncode == 0, child.stderr[-3000:]
    line = next(
        ln for ln in child.stdout.splitlines() if ln.startswith("SPILLSIG ")
    )
    got = json.loads(line.removeprefix("SPILLSIG "))
    assert got["spilled"] > 0, (
        "no spill recorded — the memory-pressure knobs no longer bite; "
        f"stage metrics said {got}"
    )

    import tectonic_spark.operators as ops
    from pyspark.sql import functions as F

    df = ops.REGISTRY["c01_line_dedup"].builder(spark, scaled)
    want = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash(*df.columns).cast("long")).alias("h"),
    ).collect()[0]
    assert got["n"] == want["n"] and got["h"] == want["h"], (
        "spilled run diverged from in-memory run",
        got,
        dict(n=want["n"], h=want["h"]),
    )

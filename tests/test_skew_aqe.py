"""AQE skew-join evidence (VERDICT r3 item 8): prove that Spark's runtime
OptimizeSkewedJoin actually fires on a skewed shuffle join under our
session configs, and that the result is unchanged by the optimization.

b03_join_salted demonstrates MANUAL salting (compile-time mitigation);
this test demonstrates the RUNTIME path — AQE detecting a post-shuffle
partition that exceeds both the size threshold and factor×median, and
splitting it into sub-partitions (plan shows ``skew=true``). SCALING.md
documents when each tool is the right one.

The thresholds are scaled down (the detection math is identical at any
scale — it compares post-shuffle partition sizes) so a 300k-row hot key
triggers what a multi-GB hot key would trigger in production.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    # force a shuffle join: no broadcast side
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # make the skew detector sensitive enough for a test-sized fixture
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    # keep AQE from folding everything into one partition first
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_frames(spark):
    # 95% of fact rows share key 0 — one post-shuffle partition dwarfs the
    # median, exactly the shape a hot customer/token key produces at 100 TB.
    fact = spark.range(0, 300_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    dim = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("grp")
    )
    return fact, dim


def test_optimize_skewed_join_fires(spark, skew_confs):
    fact, dim = _skewed_frames(spark)
    joined = fact.join(dim, "k")
    # AQE decides at RUNTIME: run THIS frame's own job (count() would build
    # a different QueryExecution), then read the final adaptive plan
    n = len(joined.collect())
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:4000]
    assert n > 0


def test_skew_split_preserves_result(spark, skew_confs):
    fact, dim = _skewed_frames(spark)
    with_aqe = (
        fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )
    ).collect()[0]
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        without = (
            fact.join(dim, "k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
            )
        ).collect()[0]
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert with_aqe == without

"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plan — filters pushed to parquet, dimension joins
broadcast, global top-k as TakeOrderedAndProject, codegen in the hot path."""

from __future__ import annotations

import tectonic_spark.operators as ops
from tectonic_spark.plans import explain_str, physical_plan


def build(spark, sf_dir, name: str):
    return ops.REGISTRY[name].builder(spark, sf_dir)


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "b02_filter_pushdown"))
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_column_pruning(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "b01_project_compute"))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_shipdate" not in read_schema[0]


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = physical_plan(build(spark, sf_dir, "b03_join_star"))
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = physical_plan(build(spark, sf_dir, "b08_topk"))
    assert "TakeOrderedAndProject" in plan


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = physical_plan(build(spark, sf_dir, "b05_pricing_summary"))
    assert plan.count("HashAggregate") >= 2


def test_codegen_in_hot_path(spark, sf_dir):
    # Pre-execution AQE hides codegen subtrees; disable it for the check.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = explain_str(build(spark, sf_dir, "b05_pricing_summary"), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in plan
    assert "Found 0 WholeStageCodegen" not in plan

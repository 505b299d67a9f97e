"""Shuffle-budget regression guard: pin the Exchange count of each
headline query's physical plan. A refactor that silently adds a shuffle
(lost broadcast, lost partial agg, a repartition sneaking in) fails here
long before it shows up as an sf1 timing regression.

Budgets are CEILINGS measured from the current (reviewed) plans — going
under is fine; going over means a plan shape changed and must be
re-justified.
"""

from __future__ import annotations

import pytest

import tectonic_spark.operators as ops
from tectonic_spark.plans import physical_plan

# name -> max "Exchange" substring count in the plan string (the plan
# text mentions each operator more than once, so these are STRING counts
# pinned to the current reviewed plans, not operator counts — the guard
# property is identical: a new shuffle strictly increases the count)
EXCHANGE_BUDGET = {
    # r13: +1 for the conditional spread_small_scan repartition — the test
    # SF's single-row-group file serializes the decimal partials on one
    # core without it; the spread is a no-op at scale (frac=0.5 gate)
    "b05_pricing_summary": 2,
    "q03_shipping_priority": 3,
    "q05_local_supplier_volume": 7,  # dims broadcast; facts SMJ (r13 merge hint)
    "b03_join_star": 3,
    "b04_range_join": 2,
    "b07_topn_per_group": 4,
    "b08_topk": 0,  # TakeOrderedAndProject, no exchange
    "c01_dedup_exact": 1,  # digest groupBy only
    "c01_minhash_lsh": 8,
    "c02_cosine_topk": 2,
    "c03_token_stats": 0,  # pure per-row projection
    "c04_repetition": 1,  # per-row Arrow kernel; 1 = local small-scan fan-out
    "c04_mixture_sampling": 0,  # stateless hash filter
    "c03_chunking": 0,  # posexplode, partition-local
    "c04_dsir": 7,
    # r13: the edge list is persisted; the string count includes the
    # CACHED subplan printed inside InMemoryRelation (executed once),
    # so the ceiling reads higher while the executed exchanges dropped
    "c06_pagerank": 88,
    # round-4b additions (measured ceilings, same string-count metric)
    "b15_event_funnel": 10,
    "b16_retention_cohorts": 7,
    "c02_mips_topk": 2,
    "c04_epoch_plan": 4,
    "c01_cross_snapshot_dedup": 2,
    # r5 rewrite: the closure join executes ONCE (explode, not a 3-way
    # union that re-ran the join per branch) — ceiling tightened 144 -> 56
    # r13: the self-join probe carries a merge hint (lineitem must never
    # be broadcast-built); SMJ adds a sort+exchange pair per appearance
    "c06_triangle_count": 70,
    # round-5 additions (measured ceilings)
    # r7: +1 for the CONDITIONAL spread_small_scan repartition — it fires
    # at test scale (the doc_id scan arrives in fewer splits than cores;
    # 30 of 32 cores sat idle through the decode stage at sf1) and is a
    # plan no-op on a real corpus whose scan already fans out. The string
    # count is 2 because the plan text names each Exchange twice here.
    "m08_jpeg_decode": 2,
    "m09_jpeg_resize_reencode": 2,
    "c02_pq_adc_scaled": 4,
    # r13: the persisted corpus lineage carries the conditional
    # spread_small_scan repartition (no-op at scale); per-iteration
    # exchanges still live in earlier jobs
    "c02_kmeans_scaled": 1,
    "c01_semantic_dedup_scaled": 15,  # block-pair replication joins + combine
    "c02_ivf_persistent": 2,  # broadcast probe join; window only
    "c02_ivf_delta_append": 2,
    "c01_line_dedup": 3,
    "c03_nb_langid": 18,
    "b07_ewma": 1,
    "b17_anomaly_zscore": 2,
    "b18_event_transitions": 2,
    "c04_datasheet": 5,
    # r13 font walks: spread_small_scan repartition only (the m08 shape)
    "m29_font_reconstruct": 2,
    "m30_woff1_census": 2,
    "m31_font_metrics": 2,
    "m32_cff_census": 2,
}


@pytest.fixture(autouse=True)
def _pin_plan_confs(spark):
    """Budgets were measured under the session defaults; pin the confs
    other tests may mutate so suite ordering can't shift plan shapes."""
    pins = {
        "spark.sql.autoBroadcastJoinThreshold": "10485760",
        "spark.sql.adaptive.enabled": "true",
    }
    old = {k: spark.conf.get(k) for k in pins}
    for k, v in pins.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_exchange_budget(spark, sf_dir, name):
    plan = physical_plan(ops.REGISTRY[name].builder(spark, sf_dir))
    # after any same-session execution, AQE stage reuse makes toString
    # append an "== Initial Plan ==" section — count only the current plan
    plan = plan.split("== Initial Plan ==")[0]
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= EXCHANGE_BUDGET[name], (
        f"{name}: {n_exchanges} Exchange ops > budget "
        f"{EXCHANGE_BUDGET[name]} — a shuffle crept into the plan"
    )

"""Persistent IVF index lifecycle (similarity.py, VERDICT r4 item 2):
build → save (cell-partitioned catalog table) → load → search (partition-
pruned, shuffle-free candidate join) → append delta. Result equality with
the in-plan c02_ann_ivf is the oracle contract; these tests pin the
lifecycle mechanics the oracle can't see."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tectonic_spark.operators.similarity import (
    _drop_catalog_table,
    c02_ann_ivf,
    ivf_append_delta,
    ivf_build_index,
    ivf_centroid_matrix,
    ivf_search_index,
)


@pytest.fixture(scope="module")
def cents(spark, sf_dir):
    c = ivf_centroid_matrix(spark, sf_dir)
    # sf0.001 carries fewer than N_CENTROIDS low vec_ids — the codebook is
    # whatever seeds exist, dimension fixed
    assert 0 < len(c) <= 32 and len(c[0][1]) == 64
    return c


def _warehouse(spark) -> str:
    return spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )


def test_build_writes_cell_partitioned_layout(spark, sf_dir, cents):
    name = "t_ivf_layout"
    _drop_catalog_table(spark, name)
    ivf_build_index(spark, sf_dir, name, cents)
    root = os.path.join(_warehouse(spark), name)
    cells = sorted(d for d in os.listdir(root) if d.startswith("cid="))
    assert cells, "index must be laid out one directory per cell"
    n_index = spark.table(name).count()
    n_corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    assert n_index == n_corpus
    _drop_catalog_table(spark, name)


def test_search_equals_inplan_ivf(spark, sf_dir, cents):
    name = "t_ivf_search"
    _drop_catalog_table(spark, name)
    ivf_build_index(spark, sf_dir, name, cents)
    got = (
        ivf_search_index(spark, sf_dir, name)
        .orderBy("query_id", "rn")
        .collect()
    )
    want = c02_ann_ivf(spark, sf_dir).orderBy("query_id", "rn").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    _drop_catalog_table(spark, name)


def test_delta_append_equals_one_shot_build(spark, sf_dir, cents):
    base = "t_ivf_oneshot"
    inc = "t_ivf_incremental"
    for n in (base, inc):
        _drop_catalog_table(spark, n)
    ivf_build_index(spark, sf_dir, base, cents)
    ivf_build_index(spark, sf_dir, inc, cents, where=F.col("vec_id") % 5 != 0)
    n_base_only = spark.table(inc).count()
    ivf_append_delta(spark, sf_dir, inc, cents, where=F.col("vec_id") % 5 == 0)
    assert spark.table(inc).count() > n_base_only
    one_shot = {
        (r["vec_id"], r["cid"]) for r in spark.table(base).select("vec_id", "cid").collect()
    }
    incremental = {
        (r["vec_id"], r["cid"]) for r in spark.table(inc).select("vec_id", "cid").collect()
    }
    assert one_shot == incremental, "frozen codebook ⇒ append == rebuild"
    got = ivf_search_index(spark, sf_dir, inc).orderBy("query_id", "rn").collect()
    want = ivf_search_index(spark, sf_dir, base).orderBy("query_id", "rn").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    for n in (base, inc):
        _drop_catalog_table(spark, n)


def test_search_raises_without_pruning_evidence(spark, sf_dir, cents, monkeypatch):
    """The plan assertions are live: a plan with a shuffle below the
    candidate join must raise (simulated by patching physical_plan)."""
    import tectonic_spark.plans as plans_mod

    name = "t_ivf_assert"
    _drop_catalog_table(spark, name)
    ivf_build_index(spark, sf_dir, name, cents)
    real = plans_mod.physical_plan
    monkeypatch.setattr(
        plans_mod,
        "physical_plan",
        lambda df: real(df).replace("PartitionFilters", "XFilters"),
    )
    with pytest.raises(RuntimeError, match="PartitionFilters"):
        ivf_search_index(spark, sf_dir, name)
    monkeypatch.setattr(
        plans_mod,
        "physical_plan",
        lambda df: real(df) + "\n+- Exchange hashpartitioning(fake)",
    )
    with pytest.raises(RuntimeError, match="shuffled"):
        ivf_search_index(spark, sf_dir, name)
    _drop_catalog_table(spark, name)

"""Training-pipeline operators (pipeline.py): oracle parity at sf0.001 plus
the properties the oracle can't see — scan-shape assertions and
partitioning-invariance of the deterministic sampling / packing."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import tectonic_spark.operators as ops
from check_correctness import compare, duck_con
from tectonic_spark.operators.pipeline import (
    PACK_BUCKET,
    c04_mixture_sampling,
    c04_sequence_packing,
)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize(
    "name",
    [
        "c04_repetition",
        "c04_sequence_packing",
        "c04_mixture_sampling",
        "c04_stratified_sample",
    ],
)
def test_oracle_parity(spark, sf_dir, con, name):
    q = ops.REGISTRY[name]
    sdf = q.builder(spark, sf_dir).toPandas()
    odf = con.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_packing_matches_naive_global_cumsum(spark, sf_dir):
    """The two-level exclusive scan must be bit-identical to the
    single-partition global window it replaces (the scale-safe plan is only
    valid because the result is indistinguishable)."""
    from pyspark.sql import Window

    from tectonic_spark.operators.pipeline import SEQ_LEN
    from tectonic_spark.tables import table

    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("n", F.size("w").cast("long"))
    )
    w_glob = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = d.withColumn(
        "off", F.coalesce(F.sum("n").over(w_glob), F.lit(0).cast("long"))
    ).select("doc_id", "off")

    fast = c04_sequence_packing(spark, sf_dir)
    # recompute offsets from the packed result is awkward; instead compare
    # the packed output against a naive pack built from the naive offsets
    tok = naive.join(d, "doc_id").select(
        "doc_id", "off", F.posexplode("w").alias("pos", "tok")
    )
    naive_pack = (
        tok.select("doc_id", (F.col("off") + F.col("pos")).alias("gpos"), "tok")
        .withColumn("seq_id", F.floor(F.col("gpos") / SEQ_LEN))
        .groupBy("seq_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("gpos", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("seq_hash"),
        )
    )
    assert fast.exceptAll(naive_pack).isEmpty()
    assert naive_pack.exceptAll(fast).isEmpty()


def test_packing_bucket_window_is_partitioned(spark, sf_dir):
    """The per-document window must be partitioned by bucket — only the
    tiny bucket-totals window (N/PACK_BUCKET rows) may be global."""
    plan = c04_sequence_packing(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert f"floor((doc_id" in plan or "bucket" in plan


def test_mixture_sampling_partitioning_invariant(spark, sf_dir):
    """Same kept set regardless of how the input is partitioned — the
    reproducibility contract of hash-based sampling."""
    base = c04_mixture_sampling(spark, sf_dir)
    rows = sorted(r.doc_id for r in base.collect())
    # force a different partitioning of the same source
    from tectonic_spark.tables import table

    d = table(spark, sf_dir, "documents").repartition(7, "source")
    m = F.substring("source", 4, 10).cast("int") % 4
    rate_bp = (
        F.when(m == 0, 10000).when(m == 1, 5000).when(m == 2, 2500).otherwise(1000)
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("source"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    again = sorted(
        r.doc_id for r in d.where(h % 10000 < rate_bp).select("doc_id").collect()
    )
    assert rows == again
    assert len(rows) > 0


def test_mixture_sampling_rates_plausible(spark, sf_dir):
    """Kept fraction per source should be within a loose tolerance of the
    configured rate (md5 uniformity)."""
    out = c04_mixture_sampling(spark, sf_dir)
    from tectonic_spark.tables import table

    tot = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("total"))
    )
    kept = out.groupBy("source").agg(
        F.count("*").alias("kept"), F.first("rate_bp").alias("rate_bp")
    )
    for r in kept.join(tot, "source").collect():
        expected = r.rate_bp / 10000
        got = r.kept / r.total
        # sf0.001/0.01 sources are small (25-250 docs) — loose binomial bound
        assert abs(got - expected) < 0.35, (r.source, got, expected)


def test_repetition_detects_repeats(spark):
    """Hand-built docs: a fully-repeated doc scores high, an all-distinct
    doc scores zero on the dup metrics."""
    import pandas as pd
    import tempfile, os

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["spam ham spam ham spam ham spam ham", "a b c d e f g h"],
            "lang": ["en", "en"],
            "source": ["src0", "src1"],
        }
    )
    df["n_chars"] = df["text"].str.len()
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "documents.parquet")
    df.to_parquet(path)
    out = {
        r.doc_id: r
        for r in ops.REGISTRY["c04_repetition"].builder(spark, tmp).collect()
    }
    assert out[0].dup_word_frac > 0.7  # only 2 distinct of 8 tokens
    assert out[0].top_2gram_frac > 0.5  # "spam ham" dominates
    assert out[0].dup_3gram_frac > 0.5
    assert out[1].dup_word_frac == 0.0
    assert out[1].dup_3gram_frac == 0.0


def test_decontamination_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set must broadcast (no SortMergeJoin of the
    corpus against it) — the property that keeps decontamination linear
    at 100 TB."""
    from tectonic_spark.plans import physical_plan

    plan = physical_plan(
        ops.REGISTRY["c04_decontamination"].builder(spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontamination_flags_planted_leak(spark, tmp_path):
    """Plant an exact benchmark passage inside a training doc: it must be
    flagged; an unrelated doc must not."""
    import pandas as pd

    from tectonic_spark.operators.pipeline import DECON_K, DECON_MOD

    passage = " ".join(f"w{i}" for i in range(DECON_K))
    rows = [
        # doc_id 0: benchmark member (0 % DECON_MOD == 0)
        {"doc_id": 0, "text": passage + " tail tokens here"},
        # doc_id 1: training doc leaking the passage
        {"doc_id": 1, "text": "prefix " + passage + " suffix"},
        # doc_id 2: clean training doc
        {"doc_id": 2, "text": "totally different words only " + " ".join(
            f"z{i}" for i in range(DECON_K))},
    ]
    df = pd.DataFrame(rows)
    df["lang"] = "en"
    df["source"] = "src0"
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet")
    out = {
        r.doc_id: r.n_contaminated_shingles
        for r in ops.REGISTRY["c04_decontamination"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert out.get(1, 0) >= 1
    assert 2 not in out
    assert 0 not in out  # benchmark docs are not reported


def test_curation_oracle_parity(spark, sf_dir, con):
    q = ops.REGISTRY["c05_corpus_curation"]
    sdf = q.builder(spark, sf_dir).toPandas()
    odf = con.execute(q.oracle).fetchdf()
    problems = compare("c05_corpus_curation", sdf, odf)
    assert not problems, problems


def test_curation_composes_in_one_plan(spark, sf_dir):
    """The four stages fuse into one Catalyst plan: no CartesianProduct,
    the decontamination anti probe broadcasts, and the curated subset is a
    strict subset of the mixture-sampled set."""
    from tectonic_spark.plans import physical_plan

    df = ops.REGISTRY["c05_corpus_curation"].builder(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    curated = {r.doc_id for r in df.select("doc_id").collect()}
    sampled = {
        r.doc_id
        for r in ops.REGISTRY["c04_mixture_sampling"]
        .builder(spark, sf_dir)
        .select("doc_id")
        .collect()
    }
    assert curated <= sampled
    assert curated


def test_stratified_sample_quota_and_invariance(spark, sf_dir):
    from tectonic_spark.operators.pipeline import STRAT_K, c04_stratified_sample

    out = c04_stratified_sample(spark, sf_dir)
    per = out.groupBy("lang", "source").count().toPandas()
    assert (per["count"] <= STRAT_K).all()
    # every stratum with >= K docs is filled exactly to quota
    from tectonic_spark.tables import table

    totals = (
        table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .count()
        .withColumnRenamed("count", "n_total")
        .toPandas()
    )
    merged = per.merge(totals, on=["lang", "source"])
    full = merged[merged["n_total"] >= STRAT_K]
    assert (full["count"] == STRAT_K).all()
    # deterministic across runs: same doc_ids selected
    base = {r.doc_id for r in out.select("doc_id").collect()}
    again = {
        r.doc_id
        for r in c04_stratified_sample(spark, sf_dir).select("doc_id").collect()
    }
    assert base == again

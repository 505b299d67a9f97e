"""Clustering operators (clustering.py): oracle parity at sf0.001 plus the
properties the oracle can't see — partitioning-invariance of the Lloyd
loop (the determinism claim the exact oracle rests on) and structural
sanity of the SemDeDup drop-set and shuffle shards."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import tectonic_spark.operators as ops
from check_correctness import compare, duck_con
from tectonic_spark.operators.clustering import (
    K,
    _assign,
    _seed_centroids,
    _update,
    kmeans_df,
    semantic_dedup_df,
)
from tectonic_spark.tables import table


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize(
    "name", ["c02_kmeans", "c01_semantic_dedup", "c04_corpus_shuffle"]
)
def test_oracle_parity(spark, sf_dir, con, name):
    q = ops.REGISTRY[name]
    sdf = q.builder(spark, sf_dir).toPandas()
    odf = con.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_kmeans_partitioning_invariant(spark, sf_dir):
    """The whole Lloyd loop must produce identical assignments regardless
    of input partitioning — decimal centroid sums are associative, so a
    7-partition re-shard can't move a single vector."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))

    def run(vdf):
        cent = _seed_centroids(vdf, K)
        for _ in range(2):
            cent = _update(_assign(vdf, cent))
        return (
            _assign(vdf, cent)
            .select("vec_id", "cid", "rdist")
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    base = run(v)
    resharded = run(v.repartition(7))
    assert base.equals(resharded)


def test_kmeans_covers_every_vector(spark, sf_dir):
    out = kmeans_df(spark, sf_dir).toPandas()
    n = table(spark, sf_dir, "embeddings").count()
    assert len(out) == n
    assert out["vec_id"].is_unique
    assert out["cluster"].between(0, K - 1).all()
    assert (out["dist2"] >= 0).all()


def test_semantic_dedup_structure(spark, sf_dir):
    out = semantic_dedup_df(spark, sf_dir).toPandas()
    assert out["vec_id"].is_unique  # each vector dropped at most once
    assert (out["kept_by"] < out["vec_id"]).all()  # keeper is the lower id
    assert (out["n_dups"] >= 1).all()
    # a keeper chosen as MIN(qualifying mate) is never dropped by a mate
    # with an even lower id in the same cluster unless that mate also
    # qualified against it — structural floor: the globally lowest dropped
    # vec_id's keeper must itself be kept
    if len(out):
        dropped = set(out["vec_id"])
        lowest = out.loc[out["vec_id"].idxmin()]
        assert lowest["kept_by"] not in dropped


def test_corpus_shuffle_contiguous_positions(spark, sf_dir):
    out = ops.REGISTRY["c04_corpus_shuffle"].builder(spark, sf_dir).toPandas()
    n = table(spark, sf_dir, "documents").count()
    assert len(out) == n
    assert out["doc_id"].is_unique
    for _, grp in out.groupby("shard"):
        pos = sorted(grp["pos"])
        assert pos == list(range(1, len(grp) + 1))


def test_semantic_dedup_scaled_variant_agrees_with_fold(spark, sf_dir):
    """The Arrow/numpy scale variant must produce the same drop-set
    (vec_id, kept_by, n_dups) as the oracle-matched fold path at the same
    k — only the cluster LABELS differ (seed indices vs seed vec_ids)."""
    from tectonic_spark.operators.clustering import semantic_dedup_scaled_df

    cols = ["vec_id", "kept_by", "n_dups"]
    fold = (
        semantic_dedup_df(spark, sf_dir)
        .toPandas()[cols]
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    scaled = (
        semantic_dedup_scaled_df(spark, sf_dir, k=K)
        .toPandas()[cols]
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert fold.astype("int64").equals(scaled.astype("int64"))


def test_quantization_kernel_cross_engine_parity(spark):
    """The kmeans oracle's exactness rests on round(x, 6) -> DECIMAL(27,6)
    agreeing between Spark and DuckDB for ANY double. Hammer the kernel
    with adversarial values sitting on/near the .5e-6 rounding tie, exact
    binary fractions, negatives, huge and tiny magnitudes."""
    import duckdb

    vals = [
        0.1234565, 0.1234575, -0.1234565, -0.1234575,
        1.0000005, -1.0000005, 0.9999995, -0.9999995,
        2.5e-7, -2.5e-7, 4.999999999e-7, 5.000000001e-7,
        0.125, -0.125, 0.0078125,  # exact binary fractions
        12345.6789115, -12345.6789115,
        1e-20, -1e-20, 0.0, 1234567890.1234565,
        0.3333333333333333, 0.6666666666666666, -0.7071067811865476,
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    from pyspark.sql import functions as F

    got = [
        str(r.q)
        for r in sdf.select(
            F.round("x", 6).cast("decimal(27,6)").alias("q")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        str(con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE), 6) AS DECIMAL(27,6))", [v]
        ).fetchone()[0])
        for v in vals
    ]
    assert got == want, list(zip(vals, got, want))


def test_python_round6_matches_spark_round(spark):
    """spark_round6 (the Arrow kernels' Python replica of F.round(_, 6))
    must agree with the JVM digit-for-digit — including the vectorized
    fast path's safety gate (r14). Adversaries: .5e-6 ties on both sides
    of zero, values a few ulp off a tie, signed zero, subnormals, huge
    magnitudes past the fast-path cap, NaN/Inf passthrough, plus a
    deterministic random sweep across magnitudes."""
    import math

    import numpy as np

    from tectonic_spark.operators.clustering import spark_round6

    rng = np.random.RandomState(20260817)
    rand = np.concatenate(
        [
            rng.randn(2000),
            rng.randn(2000) * 1e-6,
            rng.randn(2000) * 1e6,
            rng.randn(500) * 1e12,
            rng.randn(500) * 1e-300,
            # land many values right at / within a few ulp of the tie
            (np.floor(rng.rand(2000) * 2e6 - 1e6) + 0.5) / 1e6,
            (np.floor(rng.rand(1000) * 2e6 - 1e6) + 0.5) / 1e6
            + rng.choice([-1.0, 1.0], 1000) * 5e-13,
        ]
    )
    edge = np.array(
        [
            0.0, -0.0, 5e-7, -5e-7, 1.5e-6, -1.5e-6, 2.5e-6, -2.5e-6,
            0.1234565, -0.1234565, 0.9999995, -0.9999995,
            4.999999999e-7, 5.000000001e-7, -4.999999999e-7,
            5e-324, -5e-324, 2.2250738585072014e-308,
            1e15 + 0.5, -(1e15 + 0.5), 4.5e9 + 5e-7,
            math.inf, -math.inf, math.nan,
            0.125, -0.125, 1.0000005, -1.0000005,
        ]
    )
    vals = np.concatenate([rand, edge])
    got = spark_round6(vals)
    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    want = [
        r.r for r in sdf.select(F.round("x", 6).alias("r")).collect()
    ]
    bad = [
        (float(vals[i]), float(got[i]), want[i])
        for i in range(len(vals))
        # repr-compare: distinguishes -0.0 from 0.0 and NaN==NaN
        if repr(float(got[i])) != repr(float(want[i]))
    ]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_kmeans_scaled_variant_agrees_with_fold(spark, sf_dir):
    """The matmul scale variant must reproduce the fold variant's final
    assignment exactly on the fixed test corpus (same 6dp-rounded
    comparison key, same tie-break, bit-identical decimal centroids)."""
    from tectonic_spark.operators.clustering import kmeans_scaled_df

    fold = kmeans_df(spark, sf_dir).toPandas().sort_values("vec_id").reset_index(drop=True)
    fast = (
        kmeans_scaled_df(spark, sf_dir)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert fold[["vec_id", "cluster"]].equals(fast[["vec_id", "cluster"]])
    assert (fold["dist2"] - fast["dist2"]).abs().max() <= 1e-6


def test_semantic_dedup_blocked_variant_agrees_with_scaled(spark, sf_dir):
    """The straggler-free block-pair decomposition (r5) must reproduce the
    per-cluster scaled variant EXACTLY at equal (k, tau): the per-task
    partial (local-min keeper, local count) reduction is associative, so
    MIN/SUM over block pairs == the single-task per-cluster answer. block
    is set small enough that every cluster spans multiple blocks."""
    from tectonic_spark.operators.clustering import (
        semantic_dedup_blocked_df,
        semantic_dedup_scaled_df,
    )

    cols = ["vec_id", "cluster", "kept_by", "n_dups"]
    a = (
        semantic_dedup_scaled_df(spark, sf_dir, k=4)
        .toPandas()[cols]
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semantic_dedup_blocked_df(spark, sf_dir, k=4, block=16)
        .toPandas()[cols]
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.astype("int64").equals(b.astype("int64"))


def test_blas_assignment_margin_above_ulp_drift(spark, sf_dir):
    """ADVICE r5: the blocked/scaled paths assign clusters with the BLAS
    form ``-2 x.c + |c|^2`` while the oracle folds ``(x-c)^2``
    sequentially; the two differ by ~ulp and an exact near-tie between
    seeds could flip an assignment and fail the exact gate. This guard
    makes such a failure DIAGNOSABLE: on the test corpus, every vector's
    best-vs-second-best seed margin must exceed the worst plausible
    cross-formula drift by orders of magnitude. If this test fails on new
    data, a gate mismatch is a TIE, not an engine regression."""
    import numpy as np

    from tectonic_spark.operators.clustering import K
    from tectonic_spark.tables import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = M[:K]  # seeds are vec_id < K, in vec_id order (both paths)
    d_blas = -2.0 * (M @ C.T) + (C * C).sum(axis=1)[None, :]
    d_fold = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    # same winner under both formulas
    assert (d_blas.argmin(1) == d_fold.argmin(1)).all()
    # margin: best vs second-best, BLAS form
    part = np.partition(d_blas, 1, axis=1)
    margin = part[:, 1] - part[:, 0]
    drift = np.abs(d_blas - (d_fold - (M * M).sum(1)[:, None])).max()
    assert margin.min() > max(1e-6, 1e3 * drift), (margin.min(), drift)

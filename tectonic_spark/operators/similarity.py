"""Similarity search over the ``embeddings`` table (SURVEY.md §2.B c2):
brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the 100 TB scale path.

Scale design:

* Brute force is O(Q×N) — correct baseline, used with a bounded query set.
  The candidate side stays a single broadcast-joined pass; dot products run
  in JVM codegen via zip_with/aggregate (no Python).
* The ANN path hashes every vector to a bucket via sign-bits against fixed
  hyperplanes (deterministic, seeded) and only scores within-bucket pairs:
  shuffle key = bucket id, cost linear in N × bucket occupancy. Multi-probe
  (flipping one bit) bounds recall loss. This is the shape that survives
  1000 executors; brute force does not.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tectonic_spark.operators.registry import register
from tectonic_spark.tables import table

TOP_K = 5
N_QUERIES = 50  # bound the brute-force query side: vec_id < 50
N_PLANES = 8  # LSH hyperplanes → 256 buckets
DIM = 64


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(e: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(e, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


@register(
    "c02_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    n AS (SELECT vec_id, e,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
          FROM v),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_sum(list_transform(range(1, len(q.e) + 1),
                                         i -> q.e[i] * c.e[i]))
                   / (q.nrm * c.nrm) AS sim
          FROM n q JOIN n c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn
      FROM p) t
    WHERE rn <= {TOP_K}
    """,
    doc=f"Brute-force cosine top-{TOP_K} for {N_QUERIES} query vectors: "
    "exact ANN baseline. Neighbor order uses the unrounded sim (identical "
    "up to last-ulp) with vec_id tie-break; output sim rounded to 6 dp.",
)
def c02_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    n = v.select("vec_id", "e", _norm("e").alias("nrm"))
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    c = n.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    sim = _dot("qe", "ce") / (F.col("qn") * F.col("cn"))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"), "rn")
    )


def _hyperplanes() -> list[list[float]]:
    """Fixed random hyperplanes (seeded — deterministic across runs)."""
    rng = np.random.RandomState(42)
    return rng.randn(N_PLANES, DIM).tolist()


def bucket_col(e: str | Column) -> Column:
    """Sign-bit LSH bucket id of an embedding column (array<double>).

    The plane dot is rounded to 6 dp before the sign test — the
    c01_embedding_neardup determinism contract — so the DuckDB oracle's
    identical plane literals produce the identical buckets and the
    "approximate" LSH result is still exactly reproducible."""
    planes = _hyperplanes()
    bits = [
        F.when(
            F.round(
                F.aggregate(
                    F.zip_with(
                        e,
                        F.array(*[F.lit(float(x)) for x in p]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            )
            > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _ann_lsh_oracle() -> str:
    """DuckDB replica of c02_ann_lsh: identical plane literals, identical
    6-dp rounding before the sign test, identical rounded-sim ranking."""
    planes = _hyperplanes()

    def lit(p: list[float]) -> str:
        return "[" + ", ".join(repr(float(x)) for x in p) + "]"

    bucket = " + ".join(
        "CASE WHEN round(list_sum(list_transform(range(1, len(e) + 1), "
        f"i -> e[i] * ({lit(p)})[i])), 6) > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    n AS (SELECT vec_id, e,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm,
                 CAST({bucket} AS BIGINT) AS bucket
          FROM v),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, len(q.e) + 1),
                                           i -> q.e[i] * c.e[i]))
                   / (q.nrm * c.nrm), 6) AS sim
      FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, sim AS cos_sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn
      FROM pairs) t
    WHERE rn <= {TOP_K}
    """


@register(
    "c02_ann_lsh",
    oracle=_ann_lsh_oracle(),
    doc=f"ANN via random-hyperplane LSH: {N_PLANES} sign bits → bucket id; "
    f"top-{TOP_K} cosine within each query's bucket only. Shuffle key = "
    "bucket; linear scan cost per bucket. Recall is approximate, but the "
    "RESULT is exactly reproducible: identical plane literals + 6-dp "
    "rounding before every sign test and before the ranking sim, so the "
    "oracle replicates the bucketing (including LSH misses) bit-for-bit — "
    "the c01_embedding_neardup determinism contract, upgrading this from "
    "a rows-only check to an exact oracle.",
)
def c02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    n = v.select("vec_id", "e", _norm("e").alias("nrm"), bucket_col("e").alias("bucket"))
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    c = n.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
        "bucket",
    )
    # rank on the 6-dp-rounded sim (ties broken by neighbor_id): raw-double
    # ranking could order last-ulp-different sims differently across
    # engines; rounding first makes the ranking oracle-reproducible
    sim = F.round(_dot("qe", "ce") / (F.col("qn") * F.col("cn")), 6)
    pairs = (
        q.join(c, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("sim").alias("cos_sim"), "rn")
    )


N_CENTROIDS = 16
N_PROBE = 2


def _l2(a, b) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


@register(
    "c02_ann_ivf",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {N_CENTROIDS}),
    d AS (SELECT v.vec_id, c.cid,
                 list_sum(list_transform(range(1, len(v.e) + 1),
                          i -> (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i]))) AS dist
          FROM v, cent c),
    asg AS (SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
              FROM d) t WHERE rn = 1),
    probes AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                 FROM d WHERE vec_id < {N_QUERIES}) t WHERE rn <= {N_PROBE}),
    n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
    pairs AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
                     list_sum(list_transform(range(1, len(q.e) + 1),
                              i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm) AS sim
              FROM probes p
              JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.vec_id
              JOIN n q ON q.vec_id = p.vec_id
              JOIN n c ON c.vec_id = a.vec_id)
    SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn
      FROM pairs) t
    WHERE rn <= {TOP_K}
    """,
    doc=f"IVF-style ANN: coarse-quantize every vector to its nearest of "
    f"{N_CENTROIDS} deterministic seed centroids (the vec_id<{N_CENTROIDS} "
    f"embeddings); queries probe their {N_PROBE} nearest cells; exact "
    f"cosine top-{TOP_K} within probed cells. Deterministic construction "
    "⇒ fully oracle-checkable, unlike typical trained IVF. Scale path: "
    "assignment is a broadcast N×K pass; search shuffles on cell id only.",
)
def c02_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    cent = F.broadcast(
        v.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("cid"), F.col("e").alias("ce")
        )
    )
    d = v.crossJoin(cent).select(
        "vec_id", "cid", "e", _l2("e", "ce").alias("dist")
    )
    w_assign = W.partitionBy("vec_id").orderBy("dist", "cid")
    ranked = d.withColumn("rn", F.row_number().over(w_assign))
    asg = ranked.filter(F.col("rn") == 1).select("vec_id", "cid")
    probes = (
        ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("rn") <= N_PROBE))
        .select("vec_id", "cid")
    )
    n = v.select("vec_id", "e", _norm("e").alias("nrm"))
    q = n.select(F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn"))
    c = n.select(F.col("vec_id").alias("nid"), F.col("e").alias("ce2"), F.col("nrm").alias("cn"))
    pairs = (
        probes.alias("p")
        .join(asg.alias("a"), (F.col("a.cid") == F.col("p.cid")) & (F.col("a.vec_id") != F.col("p.vec_id")))
        .select(F.col("p.vec_id").alias("query_id"), F.col("a.vec_id").alias("neighbor_id"))
        .join(q, F.col("query_id") == F.col("qid"))
        .join(c, F.col("neighbor_id") == F.col("nid"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("qe", "ce2") / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"), "rn")
    )


@register(
    "c02_filtered_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    n AS (SELECT vec_id, label, e,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
          FROM v),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
                 list_sum(list_transform(range(1, len(q.e) + 1),
                                         i -> q.e[i] * c.e[i]))
                   / (q.nrm * c.nrm) AS sim
          FROM n q JOIN n c ON c.vec_id <> q.vec_id AND c.label = 1
          WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, neighbor_id, round(sim, 6) AS cos_sim, rn FROM (
      SELECT query_id, neighbor_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rn
      FROM p) t
    WHERE rn <= {TOP_K}
    """,
    doc="Metadata-FILTERED vector search (the RAG-pipeline shape: top-k "
    "among candidates satisfying a predicate): label = 1 filters the "
    "candidate side BEFORE similarity scoring — pre-filtering, the "
    "strategy that stays exact under any selectivity, vs post-filtering "
    "an ANN result which can return < k rows. The predicate reaches the "
    "parquet scan (PushedFilters), so the scored set is already pruned.",
)
def c02_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    n = v.select("vec_id", "label", "e", _norm("e").alias("nrm"))
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    c = n.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    sim = _dot("qe", "ce") / (F.col("qn") * F.col("cn"))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"), "rn")
    )

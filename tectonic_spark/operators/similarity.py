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
from tectonic_spark.tables import spread_small_scan, table

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


def _partial_topk(
    pairs: DataFrame,
    k: int,
    score: str,
    qcol: str,
    idcol: str,
    ascending: bool = False,
) -> DataFrame:
    """Map-side bounded top-k pre-reduction for the exact-search family
    (VERDICT r5 item 7): within every Arrow batch, keep only the k best
    (score, idcol-tie-broken) rows per query. Any dropped row has >= k
    strictly-better rows globally, so the surviving set is a SUPERSET of
    the global top-k and the exact window downstream is unchanged — but
    the query_id exchange now carries ~batches*Q*k rows instead of N*Q.
    Scores are NOT recomputed (they arrive from the JVM fold), so the
    cross-engine value hash is untouched. NaN ordering matches Spark's
    descending sort (NaN first) via na_position.

    PRECONDITION — ``score`` must be non-NULL (ADVICE r6): Arrow folds
    SQL NULL and NaN into the same pandas NA, but Spark's window ranks
    NULL *last* under desc while NaN ranks *first*, so a NULL surviving
    the batch head(k) could evict a genuine global top-k row. A JVM-side
    ``isNotNull`` guard here is NOT free: Catalyst duplicates the score
    expression into both Filter and Project, and the HOF dot-product fold
    is the dominant cost of every caller (measured: c02_cosine_topk
    0.82 -> 1.48 s at sf0.1 with the guard). Every call site computes
    ``score`` as an ``F.aggregate`` fold over non-null embedding arrays
    with a non-null zero — such a fold cannot return NULL — so the
    precondition holds by construction; a new call site with a nullable
    score must pre-filter upstream of the scoring expression. NaN is not
    NULL and is handled exactly (na_position matches the window)."""
    schema = pairs.schema

    def shrink(batches):
        for pdf in batches:
            if len(pdf):
                pdf = pdf.sort_values(
                    [qcol, score, idcol],
                    ascending=[True, ascending, True],
                    na_position="first" if not ascending else "last",
                    kind="mergesort",
                )
                yield pdf.groupby(qcol, sort=False).head(k)

    return pairs.mapInPandas(shrink, schema)


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
    # r14: spread_small_scan A/B'd here and REVERTED (interleaved at
    # sf0.1: plain 0.905 s vs spread 1.018 s best-of-4) — the partial
    # top-k shrink already collapses the probe output, so the extra
    # repartition of raw vectors costs more than the parallelism buys
    # (the b05_approx_distinct lesson).
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
    pairs = _partial_topk(pairs, TOP_K, "sim", "query_id", "neighbor_id")
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
    pairs = _partial_topk(pairs, TOP_K, "sim", "query_id", "neighbor_id")
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"), "rn")
    )


# --- Product quantization + asymmetric distance computation ---------------

PQ_M = 8  # subspaces
PQ_SUBDIM = DIM // PQ_M  # dims per subspace
PQ_K = 16  # centroids per subspace (codebook = the vec_id < PQ_K seeds)
PQ_QUERIES = 20
PQ_TOPK = 5


def _pq_oracle() -> str:
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cbt AS (SELECT list(e ORDER BY vec_id) AS cb FROM v WHERE vec_id < {PQ_K}),
    ds AS (SELECT v.vec_id,
             list_transform(range(0, {PQ_M}), m ->
               list_transform(range(0, {PQ_K}), k ->
                 round(list_sum(list_transform(range(1, {PQ_SUBDIM + 1}),
                   i -> (e[m * {PQ_SUBDIM} + i] - cb[k + 1][m * {PQ_SUBDIM} + i])
                      * (e[m * {PQ_SUBDIM} + i] - cb[k + 1][m * {PQ_SUBDIM} + i]))),
                   6))) AS t
           FROM v, cbt),
    enc AS (SELECT vec_id,
                   list_transform(t, d -> list_position(d, list_min(d))) AS pos,
                   t
            FROM ds),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, {PQ_M + 1}),
                                           m -> q.t[m][c.pos[m]])), 6) AS pq_dist
      FROM enc q JOIN enc c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {PQ_QUERIES})
    SELECT query_id, neighbor_id, pq_dist, rn FROM (
      SELECT query_id, neighbor_id, pq_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY pq_dist, neighbor_id) AS BIGINT) AS rn
      FROM pairs) t WHERE rn <= {PQ_TOPK}
    """


@register(
    "c02_pq_adc",
    oracle=_pq_oracle(),
    doc=f"Product quantization + asymmetric distance computation (Jégou "
    f"et al. 2011, TPAMI — the FAISS IndexPQ shape): split each {DIM}-dim "
    f"vector into {PQ_M} subspaces of {PQ_SUBDIM} dims, quantize every "
    f"subvector to its nearest of {PQ_K} codebook entries (deterministic "
    f"seed codebook = the vec_id<{PQ_K} embeddings, the c02_ann_ivf "
    "convention; a trained codebook plugs in c02_kmeans per subspace), "
    f"then answer {PQ_QUERIES} queries by summing per-subspace "
    f"query-to-centroid distance-table lookups (ADC) and taking top-"
    f"{PQ_TOPK}. The 100 TB point: the scan side touches only the "
    f"{PQ_M}-byte codes (32x compression at {DIM} floats), the codebook "
    "and the per-query distance tables broadcast, and encoding is pure "
    "per-row JVM array kernels — no shuffle anywhere before the "
    "Q-bounded final window. Every distance is rounded to 6 dp before "
    "argmin/ranking (tie-break: first/lowest index) so the quantization "
    "— including its errors — replays identically in the oracle.",
)
def c02_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_search(pq_codes(spark, sf_dir))


def pq_adc_scaled_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same search over the Arrow/numpy-encoded codes — the sf1+ bench
    path (test-pinned byte-identical to :func:`c02_pq_adc`)."""
    return _pq_search(pq_codes_scaled(spark, sf_dir))


@register(
    "c02_pq_adc_scaled",
    oracle=_pq_oracle(),
    doc="The PROMOTED scale variant of c02_pq_adc (VERDICT r4 item 5): "
    "one vectorized mapInPandas encoding pass instead of the interpreted "
    "HOF fold (sf1 ~26 s -> ~2 s), byte-identical tables/codes/search "
    "result (tests/test_r4b_ops.py pins it), now itself under the "
    "driver's exact oracle gate — the path a 100 TB user should run.",
)
def c02_pq_adc_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_adc_scaled_df(spark, sf_dir)


def _pq_search(enc: DataFrame) -> DataFrame:
    q = enc.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("t").alias("qt")
    )
    c = enc.select(F.col("vec_id").alias("neighbor_id"), "pos")
    adc = F.round(
        F.aggregate(
            F.zip_with("qt", "pos", lambda t, p: F.element_at(t, p.cast("int"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("pq_dist"))
    )
    pairs = _partial_topk(
        pairs, PQ_TOPK, "pq_dist", "query_id", "neighbor_id", ascending=True
    )
    w = W.partitionBy("query_id").orderBy("pq_dist", "neighbor_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "neighbor_id", "pq_dist", "rn")
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every embedding: per-subspace distance tables ``t``
    (array<array<double>>, rounded 6 dp) and 1-based code positions
    ``pos`` (array<long>). Pure per-row JVM kernels after one broadcast
    of the codebook row — the stage a real pipeline writes out as the
    compressed index."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    cbt = v.filter(F.col("vec_id") < PQ_K).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("vec_id", "e"))),
            lambda s: s["e"],
        ).alias("cb")
    )
    # stage subvectors and per-subspace codebooks as projection attributes
    # (HOF lambdas re-evaluate inline expressions per element — see
    # pipeline._bounds_col)
    def cbs(m: int):
        # factory closure, NOT `lambda c, m=m`: a second lambda parameter
        # makes PySpark pass the element INDEX into it, silently shadowing
        # the default
        return F.transform(
            "cb", lambda c: F.slice(c, m * PQ_SUBDIM + 1, PQ_SUBDIM)
        )

    staged = v.crossJoin(F.broadcast(cbt)).select(
        "vec_id",
        *[
            F.slice("e", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias(f"sub{m}")
            for m in range(PQ_M)
        ],
        *[cbs(m).alias(f"cbs{m}") for m in range(PQ_M)],
    )

    def ds(m: int):
        """16 rounded squared distances: subvector m vs each codebook entry."""
        return F.transform(
            F.col(f"cbs{m}"),
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(F.col(f"sub{m}"), c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )

    tabs = staged.select(
        "vec_id", *[ds(m).alias(f"t{m}") for m in range(PQ_M)]
    )
    return tabs.select(
        "vec_id",
        F.array(*[F.col(f"t{m}") for m in range(PQ_M)]).alias("t"),
        F.array(
            *[
                F.array_position(F.col(f"t{m}"), F.array_min(F.col(f"t{m}")))
                for m in range(PQ_M)
            ]
        ).alias("pos"),
    )


def pq_codes_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy scale variant of :func:`pq_codes` — identical output
    (test-pinned at equal input), one vectorized mapInPandas pass instead
    of the interpreted HOF fold (sf1: ~26 s → ~2 s). Only the bounded
    {PQ_K}-row codebook crosses the driver (the c02_kmeans centroid
    convention); np.argmin's first-min tie-break matches array_position
    of array_min. np.round's last-place behavior is pinned equal to
    Spark's round by the parity test, the kmeans[pandas] precedent."""
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # encoding is CPU-heavy vs a tiny scan: a small file arrives as few
    # input splits, which would serialize the numpy batches onto few
    # cores. Spread ONLY in that case (the _shingle_df rationale); at
    # 100 TB the scan already yields thousands of splits and the
    # repartition would be a pointless full shuffle of the embeddings.
    v = spread_small_scan(v, spark, "vec_id")
    cb_rows = v.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()
    sub_cb = (
        np.array([r["e"] for r in cb_rows], dtype=np.float64)
        .reshape(PQ_K, PQ_M, PQ_SUBDIM)
        .transpose(1, 0, 2)  # M x K x SUBDIM
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            S = E.reshape(len(E), PQ_M, PQ_SUBDIM)
            # T[b, m, k] = rounded squared distance of subvector m to
            # codebook entry k
            T = np.round(
                ((S[:, :, None, :] - sub_cb[None]) ** 2).sum(-1), 6
            )
            pos = T.argmin(-1) + 1
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "t": list(T.tolist()),
                    "pos": list(pos.tolist()),
                }
            )

    return v.mapInPandas(
        encode, "vec_id long, t array<array<double>>, pos array<bigint>"
    )


# --- k-NN label propagation (embedding-based auto-labeling) ---------------


@register(
    "c02_knn_classify",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    n AS (SELECT vec_id, label, e,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
          FROM v),
    p AS (SELECT q.vec_id AS query_id, q.label AS true_label,
                 c.label AS nb_label,
                 list_sum(list_transform(range(1, len(q.e) + 1),
                                         i -> q.e[i] * c.e[i]))
                   / (q.nrm * c.nrm) AS sim,
                 c.vec_id AS neighbor_id
          FROM n q JOIN n c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < {N_QUERIES}),
    topk AS (SELECT query_id, true_label, nb_label FROM (
               SELECT query_id, true_label, nb_label,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rn
               FROM p) t WHERE rn <= {TOP_K}),
    votes AS (SELECT query_id, true_label, nb_label,
                     CAST(COUNT(*) AS BIGINT) AS votes
              FROM topk GROUP BY query_id, true_label, nb_label)
    SELECT query_id, true_label, nb_label AS pred_label, votes,
           (nb_label = true_label) AS is_correct
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY votes DESC, nb_label ASC) AS vr
          FROM votes) t
    WHERE vr = 1
    """,
    doc=f"k-NN label propagation (embedding-based auto-labeling — the "
    "semi-supervised label-spreading step of a curation pipeline): each "
    f"of {N_QUERIES} query vectors takes the majority label among its "
    f"top-{TOP_K} cosine neighbors (exact ranking, vec_id tie-break; "
    "vote ties break toward the smaller label). Built on the "
    "c02_cosine_topk kernel, so at 100 TB the candidate scan swaps to "
    "the LSH/IVF/PQ index paths — the vote aggregation itself is "
    "Q-bounded and trivial.",
)
def c02_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    n = v.select("vec_id", "label", "e", _norm("e").alias("nrm"))
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = n.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nb_label"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    sim = _dot("qe", "ce") / (F.col("qn") * F.col("cn"))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "true_label", "nb_label", sim.alias("sim"), "neighbor_id")
    )
    pairs = _partial_topk(pairs, TOP_K, "sim", "query_id", "neighbor_id")
    wk = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    topk = pairs.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= TOP_K
    )
    votes = topk.groupBy("query_id", "true_label", "nb_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nb_label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("nb_label").alias("pred_label"),
            "votes",
            (F.col("nb_label") == F.col("true_label")).alias("is_correct"),
        )
    )


# --- maximum inner-product search (recommendation retrieval) --------------


@register(
    "c02_mips_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS item_id,
                 list_sum(list_transform(range(1, len(q.e) + 1),
                                         i -> q.e[i] * c.e[i])) AS score
          FROM v q JOIN v c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < {N_QUERIES})
    SELECT query_id, item_id, round(score, 6) AS ip_score, rn FROM (
      SELECT query_id, item_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score DESC, item_id) AS BIGINT) AS rn
      FROM p) t
    WHERE rn <= {TOP_K}
    """,
    doc=f"Maximum inner-product search (MIPS) top-{TOP_K} — the "
    "recommendation-retrieval scoring where magnitude MATTERS (user x "
    "item factor models rank by raw dot product; cosine's normalization "
    f"would erase item popularity). Exact baseline over {N_QUERIES} "
    "queries; at scale the standard reduction appends sqrt(M² - ||x||²) "
    "as an extra dimension, turning MIPS into the cosine problem this "
    "repo's LSH/IVF/PQ index paths already serve (Bachrach et al. "
    "RecSys'14). Same broadcast-Q / window shape as c02_cosine_topk; "
    "unrounded ranking with item tie-break, 6dp-rounded output.",
)
def c02_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    c = v.select(F.col("vec_id").alias("item_id"), F.col("e").alias("ce"))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id", _dot("qe", "ce").alias("score"))
    )
    pairs = _partial_topk(pairs, TOP_K, "score", "query_id", "item_id")
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("item_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "item_id", F.round("score", 6).alias("ip_score"), "rn")
    )


# --- persistent IVF index lifecycle (VERDICT r4 item 2) -------------------
#
# The production ANN pattern the in-plan c02 queries lack: build the index
# ONCE, persist it as a catalog table PARTITIONED BY CELL ID (a directory
# per cell — the FAISS inverted-list layout expressed in lakehouse terms),
# serve searches that scan only the probed cell directories (partition
# pruning, which engages unconditionally — bucket pruning is disabled by
# the planner under broadcast probe joins), and grow it with delta appends
# instead of rebuilds — the c01_cross_snapshot_dedup shape applied to
# retrieval.


def ivf_centroid_matrix(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    """The deterministic codebook (the vec_id < N_CENTROIDS embeddings) as
    driver-side literals — bounded 32 x 64 doubles, the PQ-codebook
    concession (similarity.py pq_codes_scaled); the corpus itself never
    crosses the driver. Float64 -> Python float -> Column literal is an
    exact IEEE round-trip, so distances match the in-plan crossJoin bit
    for bit."""
    emb = table(spark, sf_dir, "embeddings")
    rows = (
        emb.filter(F.col("vec_id") < N_CENTROIDS)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .collect()
    )
    return [(int(r["vec_id"]), list(r["e"])) for r in rows]


def _cell_structs(cents: list[tuple[int, list[float]]]) -> Column:
    """array<struct<dist,cid>> of distances to every centroid — a pure
    per-row projection (NO shuffle, NO window: the in-plan c02_ann_ivf
    ranks with a vec_id-partitioned window, which re-shuffles the corpus;
    at index-build scale the map-side form is the one that survives).
    Struct order (dist, cid) makes array_sort reproduce the oracle's
    ORDER BY dist, cid exactly."""
    return F.array_sort(
        F.array(
            *[
                F.struct(
                    _l2("e", F.array(*[F.lit(float(x)) for x in ce])).alias("dist"),
                    F.lit(int(cid)).cast("long").alias("cid"),
                )
                for cid, ce in cents
            ]
        )
    )


def ivf_assign_df(v: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, e) -> one index row (vec_id, cid, e, nrm): nearest cell by
    (dist, cid), norm precomputed so searches never join back to the
    corpus."""
    return v.select(
        "vec_id",
        F.element_at(_cell_structs(cents), 1)["cid"].alias("cid"),
        "e",
        _norm("e").alias("nrm"),
    )


def _drop_catalog_table(spark: SparkSession, name: str) -> None:
    import os
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(os.path.join(wh.removeprefix("file:"), name), ignore_errors=True)


def ivf_build_index(
    spark: SparkSession,
    sf_dir: str,
    index_table: str,
    cents: list[tuple[int, list[float]]],
    where: Column | None = None,
) -> None:
    """BUILD+SAVE: assign every (filtered) corpus vector map-side and
    persist as a cid-PARTITIONED catalog table — one directory per cell
    (the inverted list), so probe-time cell selection is partition
    pruning on the scan, not a filter over the whole index."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    if where is not None:
        v = v.filter(where)
    (
        ivf_assign_df(v, cents)
        .write.partitionBy("cid")
        .mode("overwrite")
        .saveAsTable(index_table)
    )


def ivf_append_delta(
    spark: SparkSession,
    sf_dir: str,
    index_table: str,
    cents: list[tuple[int, list[float]]],
    where: Column,
) -> None:
    """APPEND: assign only the delta rows against the FROZEN codebook and
    append into the same bucket layout — delta-sized work, no rebuild (the
    c01_cross_snapshot_dedup incremental pattern)."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).filter(where)
    (
        ivf_assign_df(v, cents)
        .write.partitionBy("cid")
        .mode("append")
        .saveAsTable(index_table)
    )


def ivf_search_index(
    spark: SparkSession, sf_dir: str, index_table: str
) -> DataFrame:
    """LOAD+SEARCH the persisted index: queries probe their N_PROBE
    nearest cells; the probed cell ids (bounded by N_CENTROIDS) are pushed
    as an IN filter on the PARTITION column, so the scan plans only the
    probed cell directories — the IVF serving win: unprobed inverted
    lists are never read. The builder RAISES unless the plan proves both
    properties: the cell predicate landed in PartitionFilters (pruned
    scan) and zero Exchange below the probe join (broadcast probes,
    cell-local scan)."""
    from tectonic_spark.plans import physical_plan

    cents = ivf_centroid_matrix(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            _norm("e").alias("qn"),
            F.slice(_cell_structs(cents), 1, N_PROBE).alias("cells"),
        )
        .select(
            "query_id", "qe", "qn", F.explode(F.col("cells")["cid"]).alias("cid")
        )
    )
    # bounded driver round-trip: the DISTINCT probed cells (<= N_CENTROIDS
    # ints) become the bucket-pruning predicate
    probed = sorted({r["cid"] for r in q.select("cid").distinct().collect()})
    idx = spark.table(index_table).filter(F.col("cid").isin(probed))
    pairs = (
        F.broadcast(q)
        .join(
            idx,
            (idx["cid"] == q["cid"]) & (idx["vec_id"] != q["query_id"]),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot("qe", "e") / (F.col("qn") * F.col("nrm"))).alias("sim"),
        )
    )
    plan = physical_plan(pairs)
    pf = [
        ln
        for ln in plan.splitlines()
        # small IN lists render as "IN (...)", large ones as "INSET ..."
        if "PartitionFilters" in ln
        and "cid" in ln
        and (" IN " in ln or " INSET " in ln)
    ]
    if not pf:
        raise RuntimeError(
            "ivf_search: probed-cell IN predicate did not reach "
            "PartitionFilters — cell pruning is not engaging"
        )
    shuffles = [
        ln
        for ln in plan.splitlines()
        # BroadcastExchange (the bounded probe side) is the point; any
        # SHUFFLE exchange below the candidate join is the failure mode
        if "Exchange hashpartitioning" in ln
        or "Exchange rangepartitioning" in ln
        or "Exchange SinglePartition" in ln
    ]
    if shuffles:
        raise RuntimeError(
            "ivf_search: candidate generation shuffled — probe join must "
            f"be broadcast over the cell-local index scan: {shuffles[:2]}"
        )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"), "rn")
    )


from tectonic_spark.operators.registry import REGISTRY as _REG  # noqa: E402


@register(
    "c02_ivf_persistent",
    oracle=_REG["c02_ann_ivf"].oracle,
    doc="Persistent IVF index LIFECYCLE (VERDICT r4 item 2): build the "
    "index as a cell-partitioned catalog table (one directory per cell — "
    "the FAISS inverted-list layout; map-side assignment against the "
    "frozen 32-centroid codebook, no window, no corpus shuffle), then "
    "serve the search from the SAVED table with the probed cells pushed "
    "as a partition-pruning IN predicate (plan-asserted PartitionFilters, "
    "zero Exchange below the probe join). Result must equal the in-plan "
    "c02_ann_ivf exactly — same oracle.",
)
def c02_ivf_persistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = "c02_ivf_idx"
    _drop_catalog_table(spark, name)
    cents = ivf_centroid_matrix(spark, sf_dir)
    ivf_build_index(spark, sf_dir, name, cents)
    return ivf_search_index(spark, sf_dir, name)


@register(
    "c02_ivf_delta_append",
    oracle=_REG["c02_ann_ivf"].oracle,
    doc="Persistent IVF index DELTA APPEND: build the base index over 80% "
    "of the corpus (vec_id % 5 != 0), then APPEND the remaining 20% as a "
    "delta assigned against the frozen codebook into the same bucket "
    "layout (no rebuild — delta-sized work, the cross-snapshot-dedup "
    "incremental pattern applied to retrieval), then search. Because the "
    "codebook is frozen, incremental build == one-shot build, so the "
    "searched result must exactly equal the in-plan c02_ann_ivf — same "
    "oracle; a drift anywhere in the append path (missed rows, bucket "
    "mismatch, re-assignment) breaks the hash.",
)
def c02_ivf_delta_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = "c02_ivf_idx_delta"
    _drop_catalog_table(spark, name)
    cents = ivf_centroid_matrix(spark, sf_dir)
    ivf_build_index(spark, sf_dir, name, cents, where=F.col("vec_id") % 5 != 0)
    ivf_append_delta(spark, sf_dir, name, cents, where=F.col("vec_id") % 5 == 0)
    return ivf_search_index(spark, sf_dir, name)


# ------------------------------------------------------- Gram matrix (r9)


@register(
    "c02_gram_matrix",
    oracle="""
    WITH prod AS (
      SELECT t1.i AS i, t2.j AS j,
             CAST(FLOOR(CAST(embedding[t1.i + 1] AS DOUBLE)
                        * CAST(embedding[t2.j + 1] AS DOUBLE)
                        * 1000000) AS BIGINT) AS p
      FROM embeddings, range(0, 64) t1(i), range(0, 64) t2(j)
      WHERE t2.j >= t1.i
    )
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(SUM(p) AS BIGINT) AS gram_fixed
    FROM prod GROUP BY i, j
    """,
    doc="Distributed Gram matrix X^T X over the embedding corpus (r9) — "
    "the linear-algebra primitive behind PCA / whitening / covariance "
    "in embedding pipelines, in the shape MLlib computes it: each "
    "Arrow batch folds its rows into ONE 64x64 partial (map-side "
    "combine inside mapInPandas, chunked so the outer-product "
    "temporary stays cache-sized), and the only exchange is "
    "n_batches x 2080 upper-triangle entries — never the corpus. "
    "Cross-engine exactness WITHOUT decimal casts on a per-pair "
    "explode (which would be an O(N x D^2) row blow-up at scale): "
    "every per-row product quantizes to fixed-point via "
    "floor(x_i * x_j * 1e6) in float64 — floor is unambiguous where "
    "round would invite half-even vs half-away drift — so partials are "
    "INTEGER sums, associative and order-independent, and the driver's "
    "value hash matches DuckDB bit-for-bit.",
)
def c02_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    emb = table(spark, sf_dir, "embeddings").select("embedding")
    emb = spread_small_scan(emb, spark, "embedding")
    schema = StructType([StructField("gram", ArrayType(LongType()), True)])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            G = np.zeros((DIM, DIM), dtype=np.int64)
            for r0 in range(0, len(X), 512):
                blk = X[r0 : r0 + 512]
                G += (
                    np.floor(blk[:, :, None] * blk[:, None, :] * 1e6)
                    .astype(np.int64)
                    .sum(axis=0)
                )
            yield pd.DataFrame({"gram": [G.reshape(-1).tolist()]})

    parts = emb.mapInPandas(partial, schema)
    k = F.posexplode("gram").alias("k", "v")
    flat = parts.select(k)
    return (
        flat.select(
            (F.col("k") / DIM).cast("long").alias("i"),
            (F.col("k") % DIM).cast("long").alias("j"),
            F.col("v"),
        )
        .where(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum("v").alias("gram_fixed"))
    )


@register(
    "c02_random_projection",
    oracle="""
    SELECT vec_id, CAST(t.k AS BIGINT) AS k,
           CAST(list_sum(list_transform(range(0, 64), i ->
                CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1000000)
                     AS BIGINT)
                * (((i * 31 + t.k * 17) % 2) * 2 - 1)
           )) AS BIGINT) AS proj_fixed
    FROM embeddings, range(0, 16) t(k)
    """,
    doc="Johnson-Lindenstrauss random projection 64 -> 16 (r9) — the "
    "dimensionality-reduction step embedding pipelines run before ANN "
    "indexing: a seeded Achlioptas +-1 sign matrix (closed form in "
    "(i, k), no stored state) projects every vector in one vectorized "
    "integer matmul. Exactness: inputs quantize per-COMPONENT to "
    "fixed-point floor(x * 1e6) BEFORE the dot product, so the "
    "projection is an integer sum — numpy's pairwise summation and "
    "DuckDB's sequential list_sum would disagree in ulps on a float "
    "dot, integers cannot. 100 TB shape: stateless per row, no "
    "exchange at all (narrow map over the scan).",
)
def c02_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    K = 16
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    schema = StructType(
        [
            StructField("vec_id", LongType(), True),
            StructField("k", LongType(), True),
            StructField("proj_fixed", LongType(), True),
        ]
    )
    i = np.arange(DIM)[:, None]
    kk = np.arange(K)[None, :]
    S = (((i * 31 + kk * 17) % 2) * 2 - 1).astype(np.int64)  # (64, 16)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            Xq = np.floor(X * 1e6).astype(np.int64)
            P = Xq @ S  # (B, 16) integer matmul
            ids = np.asarray(pdf["vec_id"], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, K),
                    "k": np.tile(np.arange(K, dtype=np.int64), len(ids)),
                    "proj_fixed": P.reshape(-1),
                }
            )

    return emb.mapInPandas(project, schema)

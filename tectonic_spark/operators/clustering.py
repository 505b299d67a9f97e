"""Embedding clustering (SURVEY.md §2.B c2 extension): distributed k-means
(Lloyd's algorithm, fixed iteration count) and SemDeDup-style semantic
deduplication (cluster, then prune near-identical members within each
cluster — Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540, public).

Scale design (the 100 TB story):

* **k-means assignment never shuffles the corpus — zero exchanges.**
  The argmin runs map-side as one vectorized Arrow-batch kernel per
  partition against the K x DIM centroid matrix (collected between
  iterations — the bounded-metadata concession MLlib makes); each
  vector is scored and assigned in place, with no crossJoin fan-out
  and no per-vector exchange at any iteration. (r13: this replaced an
  interpreted ``F.aggregate`` fold — same arithmetic bit-for-bit, see
  ``_assign`` — after the fold measured as the slowest sf1 bench row.)
* **The centroid update shuffles K x DIM partials, not vectors.**
  ``posexplode`` fans each assigned vector into (cid, pos, x) map-side;
  partial aggregation reduces every partition to at most K x DIM rows
  before the exchange, so update cost is independent of corpus size
  past the scan. This is the classic scalable k-means shape (MLlib does
  the same reduction, then collects to the driver; we stay in-plan so
  Catalyst sees the whole loop).
* **SemDeDup's clusters bound the pairwise stage.** Within-cluster
  pairs cost ~N^2/K per cluster; the published recipe scales K with the
  corpus (~100k clusters at web scale) so clusters stay executor-sized.
  K=8 here pins the oracle at sf0.01; ``semantic_dedup_df(k=...)`` is
  the knob.

Cross-engine exactness (why an iterative float algorithm can have an
exact DuckDB oracle):

* Centroid means are order-insensitive: per-dimension contributions are
  quantized to 6 dp and summed as DECIMAL(27,6) (exact, associative),
  divided once in double. A double -> decimal(27,6) cast of a
  ``round(x, 6)`` value is unambiguous in both engines (the double is
  never within an ulp of a .5e-6 tie), so both engines derive the
  bit-identical centroid at every iteration.
* Distances are rounded to 6 dp before the argmin, with the cluster id
  as tie-break — the bucket_col/minhash determinism contract, applied to
  Lloyd assignment: even when two engines' left-fold sums differ in the
  last ulp, the rounded comparison key agrees.

Reference parity note: the reference engine (precog/tectonic) has no
clustering surface at all (SURVEY.md §2.A "categories with NO
implementation"); this module is part of the beyond-reference
training-data-pipeline surface the engine exists to serve.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tectonic_spark.operators.registry import register
from tectonic_spark.tables import table

K = 8  # clusters == seed vectors (vec_id < K); scale knob at real corpus size
ITERS = 2  # Lloyd update steps; output = assignment against final centroids
DIM = 64
SEM_TAU = 0.45  # within-cluster cosine threshold for semantic near-dups


def spark_round6(a: "np.ndarray") -> "np.ndarray":
    """Bit-exact replica of Spark's ``round(double, 6)`` over an array.

    Spark's Round on DoubleType evaluates
    ``BigDecimal(Double.toString(x)).setScale(6, HALF_UP).toDouble`` —
    i.e. it rounds the SHORTEST decimal representation of the double,
    half-up, then converts back (NaN/Infinity pass through unrounded).
    Python's ``repr(float)`` is the same shortest round-trip
    representation, so ``Decimal(repr(x)).quantize(1e-6, ROUND_HALF_UP)``
    reproduces it digit-for-digit (pinned against F.round by
    tests/test_clustering.py::test_python_round6_matches_spark_round,
    incl. .5e-6 boundary and subnormal adversaries).

    r14 (guide §4.2, VERDICT r13 item 5): the per-element ``Decimal``
    loop — O(n*K) interpreted work inside the Arrow kmeans kernel — is
    now a three-op vectorized fast path with an exact-safety gate. For
    finite ``|x| <= 1e6`` whose scaled fractional part is farther than
    1e-3 from the .5 tie, ``rint(x*1e6)/1e6`` provably equals the
    Decimal result: the accumulated error (repr shortening < 0.5 ulp of
    x, fl(x*1e6) < 0.5 ulp ~ 2.2e-7 in fractional units at |x|=1e3)
    cannot bridge the 1e-3 margin, away from a tie round-to-nearest and
    HALF_UP agree, and IEEE division by the exactly-representable 1e6
    returns the same correctly-rounded double as
    ``Decimal(n)*1e-6 -> float``. Everything else (ties, huge, NaN/Inf,
    ~0.2% of uniform data) falls back to the proven Decimal path.
    """
    from decimal import ROUND_HALF_UP, Decimal

    flat = np.ascontiguousarray(a, dtype=np.float64).ravel()
    m = flat * 1e6
    with np.errstate(invalid="ignore"):
        out = np.rint(m) / 1e6
        frac_dist = np.abs(m - np.floor(m) - 0.5)
    finite = np.isfinite(flat)
    out[~finite] = flat[~finite]  # Spark passes NaN/Inf through
    unsafe = finite & ((np.abs(flat) > 1e6) | (frac_dist < 1e-3))
    if unsafe.any():
        q6 = Decimal("0.000001")
        for i in np.nonzero(unsafe)[0]:
            out[i] = float(Decimal(repr(flat[i])).quantize(q6, ROUND_HALF_UP))
    # Java BigDecimal has NO signed zero: Spark's round(-1e-7, 6) and
    # round(-0.0, 6) are +0.0, where rint/Decimal keep the sign. IEEE
    # -0.0 + 0.0 == +0.0 and x + 0.0 == x for every other x (incl. NaN),
    # so one vectorized add normalizes the zeros. (The pre-r14 Decimal
    # loop had this latent -0.0 mismatch; the property test now pins it.)
    out = out + 0.0
    return out.reshape(a.shape)


def _exact_sq_dists(m: "np.ndarray", cm: "np.ndarray") -> "np.ndarray":
    """(n, K) squared distances with the FOLD's summation order: for each
    (row, centroid) the terms (e[d]-ce[d])^2 accumulate left-to-right over
    d — one vectorized elementwise step per dimension, so every scalar sum
    is ``((t0 + t1) + t2) ...``, bit-identical to the old Catalyst fold's
    ``((0.0 + t0) + t1) ...`` (IEEE: 0.0 + t == t for the non-negative
    squared terms). No matmul, no pairwise summation."""
    n, kk = m.shape[0], cm.shape[0]
    d2 = np.empty((n, kk), dtype=np.float64)
    for j in range(kk):
        diff = m[:, 0] - cm[j, 0]
        acc = diff * diff
        for d in range(1, cm.shape[1]):
            diff = m[:, d] - cm[j, d]
            acc = acc + diff * diff
        d2[:, j] = acc
    return d2


def _assign(v: DataFrame, cent: DataFrame, k: int = K) -> DataFrame:
    """Nearest-centroid assignment with ZERO corpus shuffle.

    r13 optimization (guide §4.2): the previous implementation evaluated
    an ``F.aggregate`` fold over a broadcast centroid array — a
    CodegenFallback higher-order function interpreting ~K x 2 x DIM lambda
    steps with an InternalRow allocation per step, the slowest sf1 bench
    row at 17 s. (Unrolling the fold into K codegen expressions was tried
    first and is WORSE: the 64-term chains blow janino's 64 KB method cap
    and fall back to interpreted projection, 46 s.) The assignment now
    runs as one vectorized Arrow-batch kernel per partition; the K x DIM
    centroid matrix crosses the driver between iterations — the same
    bounded-metadata concession MLlib's k-means and this module's
    ``kmeans_scaled_df`` already make. The corpus still never shuffles
    and never touches the driver.

    Bit-exactness vs the fold (the oracle contract is unchanged):
    :func:`_exact_sq_dists` reproduces the fold's left-to-right summation
    order per (row, centroid); :func:`spark_round6` reproduces
    ``F.round(_, 6)`` digit-for-digit; ``np.argmin`` over cid-ascending
    columns keeps the first (lowest-cid) minimum — the fold's strict-<
    tie-break. Returns (vec_id, e, cid, rdist).
    """
    from pyspark.sql.functions import pandas_udf

    cp = cent.toPandas().sort_values("cid")
    cm = np.stack(cp["ce"].to_numpy()).astype(np.float64)
    cids = cp["cid"].to_numpy().astype(np.int64)
    # k documents the bounded-broadcast contract; a centroid frame of a
    # different cardinality means a caller bug (ADVICE r13: use or drop)
    assert cm.shape[0] == k, (cm.shape, k)

    @pandas_udf("struct<cid: long, rdist: double>")
    def best(e: pd.Series) -> pd.DataFrame:
        if len(e) == 0:
            return pd.DataFrame({"cid": pd.Series([], dtype="int64"),
                                 "rdist": pd.Series([], dtype="float64")})
        m = np.stack(e.to_numpy()).astype(np.float64)
        r = spark_round6(_exact_sq_dists(m, cm))
        idx = np.argmin(r, axis=1)  # first min wins == lowest cid
        return pd.DataFrame(
            {"cid": cids[idx], "rdist": r[np.arange(len(m)), idx]}
        )

    return v.withColumn("b", best("e")).select(
        "vec_id", "e", F.col("b.cid").alias("cid"), F.col("b.rdist").alias("rdist")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: exact per-dimension decimal mean of members.

    posexplode -> partial-aggregated groupBy(cid, pos): the shuffle after
    map-side combine is at most K x DIM rows per partition.
    """
    pts = assigned.select("cid", F.posexplode("e").alias("pos", "x"))
    dims = pts.groupBy("cid", "pos").agg(
        (
            F.sum(F.round("x", 6).cast("decimal(27,6)")).cast("double") / F.count("*")
        ).alias("m")
    )
    return dims.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("ce")
    )


def _seed_centroids(v: DataFrame, k: int) -> DataFrame:
    """Deterministic init: the k vectors with the lowest vec_id."""
    return v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )


def kmeans_df(
    spark: SparkSession, sf_dir: str, k: int = K, iters: int = ITERS
) -> DataFrame:
    """K-means over ``embeddings``: ``iters`` Lloyd updates from the
    lowest-vec_id seeds, then a final assignment pass. Output one row per
    vector: (vec_id, cluster, dist2)."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # local-scale fan-out: a tiny corpus arrives in 1-2 parquet splits,
    # serializing the Arrow assignment kernel and the update's map-side
    # partials; at real scale the scan already yields thousands of
    # splits and this is a no-op (tables.spread_small_scan contract).
    # Assignments are partitioning-invariant (decimal sums; pinned by
    # test_kmeans_partitioning_invariant), so results are unchanged.
    from tectonic_spark.tables import spread_small_scan

    v = spread_small_scan(v, spark)
    cent = _seed_centroids(v, k)
    for _ in range(iters):
        cent = _update(_assign(v, cent, k))
    final = _assign(v, cent, k)
    return final.select(
        "vec_id", F.col("cid").alias("cluster"), F.col("rdist").alias("dist2")
    )


def _o_assign(i: int, src: str) -> str:
    """Oracle CTEs for one assignment pass against centroid CTE ``src``."""
    return f"""
s{i} AS (
  SELECT v.vec_id, v.e, c.cid,
         round(list_sum(list_transform(range(1, {DIM + 1}),
               j -> (v.e[j] - c.ce[j]) * (v.e[j] - c.ce[j]))), 6) AS rdist
  FROM v, {src} c
),
a{i} AS (
  SELECT vec_id, e, cid, rdist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY rdist, cid) AS rn
    FROM s{i})
  WHERE rn = 1
)"""


def _o_update(i: int) -> str:
    """Oracle CTEs for one centroid update from assignment a{i}."""
    return f"""
u{i} AS (
  SELECT cid, j AS pos,
         CAST(CAST(SUM(CAST(round(e[j + 1], 6) AS DECIMAL(27,6))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS m
  FROM a{i}, range(0, {DIM}) r(j)
  GROUP BY cid, j
),
c{i + 1} AS (SELECT cid, list(m ORDER BY pos) AS ce FROM u{i} GROUP BY cid)"""


def _kmeans_oracle(k: int = K, iters: int = ITERS, with_dist: bool = True) -> str:
    ctes = [
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {k})",
    ]
    for i in range(iters):
        ctes.append(_o_assign(i, f"c{i}").lstrip())
        ctes.append(_o_update(i).lstrip())
    ctes.append(_o_assign(iters, f"c{iters}").lstrip())
    cols = "vec_id, cid AS cluster" + (", rdist AS dist2" if with_dist else "")
    return "WITH " + ",\n".join(ctes) + f"\nSELECT {cols} FROM a{iters}"


@register(
    "c02_kmeans",
    oracle=_kmeans_oracle(),
    doc=f"Distributed k-means (K={K}, {ITERS} Lloyd iterations, "
    "deterministic lowest-vec_id seeds) over the embeddings table, output "
    "one (vec_id, cluster, dist2) row per vector. Assignment is a "
    "map-side vectorized Arrow kernel against the K x DIM centroid "
    "matrix (zero corpus exchanges, plan-asserted; only the centroid "
    "matrix crosses the driver between iterations, MLlib-style), the "
    "centroid update shuffles at most K x DIM decimal partials per "
    "partition, and the corpus itself is never shuffled. Exact oracle despite float "
    "iteration: centroid means are order-insensitive decimal sums of "
    "6dp-quantized coordinates, distances round to 6 dp before a "
    "cid-tie-broken argmin, so both engines walk bit-identical centroids.",
)
def c02_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_df(spark, sf_dir)


def kmeans_scaled_df(
    spark: SparkSession, sf_dir: str, k: int = K, iters: int = ITERS
) -> DataFrame:
    """Scale variant of the Lloyd loop (the big-corpus path): assignment
    runs as ONE numpy matmul-free chunked distance per Arrow batch
    against the current centroid matrix, with distances rounded to 6 dp
    and argmin tie-broken by centroid order — the same comparison key as
    the fold, so assignments agree wherever the two summation orders
    round alike (everywhere, in practice; the registered ``c02_kmeans``
    keeps the left-fold to stay bit-bound to its static oracle).

    The centroid UPDATE is the identical DataFrame decimal path, but each
    iteration's K x DIM centroid matrix is collected to the driver to be
    re-broadcast into the next assignment — the same bounded-metadata
    concession MLlib's k-means makes every iteration; the corpus itself
    never crosses the driver and never shuffles.
    """
    from pyspark import StorageLevel
    from pyspark.sql.functions import pandas_udf

    from tectonic_spark.tables import spread_small_scan

    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # r13: every iteration re-derives v (assignment UDF + posexplode
    # update), and the tiny embeddings file arrives in 2 splits — the
    # decimal update partials serialized on 2 cores (profiled 2.7 CPU-s
    # per iteration on 2 tasks). Spread across cores, persist once;
    # decimal sums are order-independent so the result is unchanged.
    v = spread_small_scan(v, spark, "vec_id").persist(StorageLevel.MEMORY_AND_DISK)
    v.count()

    def collect_centroids(cent_df: DataFrame) -> tuple[np.ndarray, np.ndarray]:
        pdf = cent_df.toPandas().sort_values("cid")
        return (
            np.stack(pdf["ce"].to_numpy()).astype(np.float64),
            pdf["cid"].to_numpy().astype(np.int64),
        )

    def assign_with(cm: np.ndarray, cids: np.ndarray) -> DataFrame:
        @pandas_udf("struct<cid: long, rdist: double>")
        def best(e: pd.Series) -> pd.DataFrame:
            m = np.stack(e.to_numpy()).astype(np.float64)
            n = len(m)
            cid_out = np.empty(n, dtype=np.int64)
            rd_out = np.empty(n, dtype=np.float64)
            for lo in range(0, n, 1024):
                chunk = m[lo : lo + 1024]
                d = np.round(
                    ((chunk[:, None, :] - cm[None, :, :]) ** 2).sum(-1), 6
                )
                idx = np.argmin(d, axis=1)  # first min wins == lowest cid
                cid_out[lo : lo + len(chunk)] = cids[idx]
                rd_out[lo : lo + len(chunk)] = d[np.arange(len(chunk)), idx]
            return pd.DataFrame({"cid": cid_out, "rdist": rd_out})

        return v.withColumn("b", best("e")).select(
            "vec_id", "e", F.col("b.cid").alias("cid"), F.col("b.rdist").alias("rdist")
        )

    cm, cids = collect_centroids(_seed_centroids(v, k))
    for _ in range(iters):
        cm, cids = collect_centroids(_update(assign_with(cm, cids)))
    return assign_with(cm, cids).select(
        "vec_id", F.col("cid").alias("cluster"), F.col("rdist").alias("dist2")
    )


@register(
    "c02_kmeans_scaled",
    oracle=_kmeans_oracle(with_dist=False),
    doc=f"The PROMOTED scale variant of c02_kmeans (VERDICT r4 item 5): "
    "the numpy/Arrow Lloyd loop a 100 TB user should actually run "
    "(vectorized chunked-distance assignment per Arrow batch, identical "
    "decimal centroid update, 3-10x faster than the interpreted fold), "
    "now itself under the driver's exact oracle gate. Output is the "
    f"final assignment (vec_id, cluster) after {ITERS} iterations — "
    "cluster ids are exactly pinned to the fold path by "
    "tests/test_clustering.py; dist2 is excluded because the two "
    "summation orders may differ in the 6th decimal's last ulp (the "
    "pinning test bounds it at 1e-6).",
)
def c02_kmeans_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_scaled_df(spark, sf_dir).select("vec_id", "cluster")


# ---------------------------------------------------------------------------
# SemDeDup


def _dot(a: Column, b: Column) -> Column:
    """Unrolled dot product over the fixed DIM (r13 optimization): the
    previous ``F.aggregate`` fold is a CodegenFallback higher-order
    function interpreted per element — Catalyst pushes SemDeDup's ``sim``
    filter into the pairwise join condition, so the fold ran per
    CANDIDATE PAIR (a thread dump showed one task burning 13 min in
    ``ArrayAggregate.eval`` inside ``HashJoin.boundCondition`` at sf1).
    The unrolled chain is one ~DIM-term codegen expression; it reproduces
    the fold's exact summation order INCLUDING the leading 0.0 seed, so
    even a -0.0 first product yields the identical signed-zero sum."""
    acc: Column = F.lit(0.0)
    for d in range(DIM):
        acc = acc + a[d] * b[d]
    return acc


def semantic_dedup_df(
    spark: SparkSession, sf_dir: str, k: int = K, tau: float = SEM_TAU
) -> DataFrame:
    """SemDeDup: one k-means assignment pass partitions the corpus into
    clusters; within each cluster, every vector whose cosine similarity to
    a lower-vec_id cluster-mate reaches ``tau`` is marked a semantic
    duplicate of the lowest such keeper. Returns one row per DROPPED
    vector: (vec_id, cluster, kept_by, n_dups)."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # unrolled ||e||^2 chain (same fold order incl. the 0.0 seed) — the
    # interpreted-HOF removal rationale is on _dot above
    nrm = F.sqrt(_dot(F.col("e"), F.col("e")))
    assigned = _assign(v, _seed_centroids(v, k), k).select(
        "vec_id", "e", "cid", nrm.alias("nrm")
    )
    a = assigned.select(
        F.col("vec_id"), F.col("e"), F.col("cid"), F.col("nrm")
    )
    b = assigned.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("e").alias("b_e"),
        F.col("cid").alias("b_cid"),
        F.col("nrm").alias("b_nrm"),
    )
    sim = F.round(_dot(F.col("e"), F.col("b_e")) / (F.col("nrm") * F.col("b_nrm")), 6)
    pairs = (
        a.join(b, (F.col("cid") == F.col("b_cid")) & (F.col("b_vec_id") < F.col("vec_id")))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= tau)
    )
    return pairs.groupBy("vec_id", "cid").agg(
        F.min("b_vec_id").alias("kept_by"), F.count("*").alias("n_dups")
    ).select(
        "vec_id", F.col("cid").alias("cluster"), "kept_by", "n_dups"
    )


_SEM_ORACLE_BODY = (
    "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),\n"
    f"c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {K}),\n"
    + _o_assign(0, "c0").lstrip()
    + f""",
n AS (
  SELECT vec_id, e, cid,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
  FROM a0
),
p AS (
  SELECT x.vec_id, x.cid,
         y.vec_id AS b_vec_id,
         round(list_sum(list_transform(range(1, {DIM + 1}),
               j -> x.e[j] * y.e[j])) / (x.nrm * y.nrm), 6) AS sim
  FROM n x JOIN n y ON x.cid = y.cid AND y.vec_id < x.vec_id
)
"""
)

_SEM_ORACLE = (
    _SEM_ORACLE_BODY
    + f"""SELECT vec_id, cid AS cluster, MIN(b_vec_id) AS kept_by,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM p WHERE sim >= {SEM_TAU}
GROUP BY vec_id, cid"""
)

# same drop-set keyed by vec_id only (each vec_id lives in exactly one
# cluster, so the group is identical) — the scaled variant's oracle, which
# omits the cluster label (seed INDEX there vs seed vec_id here)
_SEM_ORACLE_NOCLUSTER = (
    _SEM_ORACLE_BODY
    + f"""SELECT vec_id, MIN(b_vec_id) AS kept_by,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM p WHERE sim >= {SEM_TAU}
GROUP BY vec_id"""
)


def semantic_dedup_scaled_df(
    spark: SparkSession, sf_dir: str, k: int = 64, tau: float = SEM_TAU
) -> DataFrame:
    """Scale variant of SemDeDup (the bench sf1 row): same semantics —
    cluster against the k lowest-vec_id seeds, drop any vector with
    cosine >= tau to a lower-vec_id cluster-mate — but on the
    Arrow/numpy path, with ``k`` as the scale knob (per-cluster pair
    volume is ~N^2/k; the published recipe uses ~100k clusters at web
    scale).

    * Assignment: one vectorized matmul per Arrow batch against the
      broadcast (k x DIM) seed matrix — argmin of squared distance with
      index tie-break, no fold expression, no corpus shuffle.
    * Pairwise: ``applyInPandas`` per cluster — an (n_c x n_c) cosine
      matmul inside the executor; the only exchange keys on the cluster
      id. Cluster width n_c ~ N/k is the executor-memory bound; raise
      ``k`` with the corpus.
    * The driver only ever holds the k x DIM seed matrix (the same
      bounded-metadata concession MLlib's k-means makes every
      iteration); the corpus never crosses the driver.

    The registered ``c01_semantic_dedup`` keeps the fold path at K=8 to
    match its static oracle; this variant exists for corpora where the
    fold's interpreted lambdas and small-K pair volume both stop scaling.
    Cluster labels are seed INDICES (0..k-1) here, seed vec_ids there —
    the drop-set semantics are identical for identical k.
    """
    from pyspark.sql.functions import pandas_udf

    emb = table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    C = np.stack(seeds["embedding"].to_numpy()).astype(np.float64)  # (k, DIM)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("integer")
    def assign(e: pd.Series) -> pd.Series:
        m = np.stack(e.to_numpy()).astype(np.float64)  # (n, DIM)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin ties -> lowest idx
        d = -2.0 * (m @ C.T) + c_sq[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    assigned = emb.select(
        "vec_id", "embedding", assign("embedding").alias("cid")
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1)
        s = (m @ m.T) / np.outer(nrm, nrm)
        keep_rows = []
        ids = pdf["vec_id"].to_numpy()
        for i in range(1, len(pdf)):
            qual = np.nonzero(np.round(s[i, :i], 6) >= tau)[0]
            if len(qual):
                keep_rows.append(
                    (int(ids[i]), int(pdf["cid"].iloc[i]), int(ids[qual[0]]), len(qual))
                )
        return pd.DataFrame(
            keep_rows, columns=["vec_id", "cluster", "kept_by", "n_dups"]
        )

    return assigned.groupBy("cid").applyInPandas(
        prune, "vec_id long, cluster long, kept_by long, n_dups long"
    )


def semantic_dedup_blocked_df(
    spark: SparkSession,
    sf_dir: str,
    k: int = 64,
    tau: float = SEM_TAU,
    block: int = 4096,
) -> DataFrame:
    """STRAGGLER-FREE SemDeDup (r5): the sf10 spot sweep showed
    :func:`semantic_dedup_scaled_df`'s per-cluster ``applyInPandas``
    putting one GIANT cluster in one task (synthetic replicas — or any
    real head-of-distribution near-dup mass — pile onto one seed; the
    whole x100 run waited minutes on a single core at both k=256 and
    k=1024). Raising k shrinks the average cluster but not the skew.

    Fix: BLOCK-PAIR decomposition. Rows are striped into fixed
    ``block``-sized ranges of vec_id; for target block x the candidate
    blocks are every y <= x in the same cluster, so one (cid, x, y) task
    computes a bounded block x block cosine kernel regardless of cluster
    size. The drop-set reduction is associative — per-task partials
    (local min keeper, local count) combine with MIN / SUM — so the
    result is EXACTLY the per-cluster variant's (pinned by test). Cost:
    each row is shipped to ~2x its cluster's block count of tasks (data
    O(n_c^2/B) vs compute O(n_c^2) — vanishing for B in the thousands);
    the win is the biggest cluster now spreads over (n_c/B)^2/2 tasks
    instead of 1. sf10: 825 s -> straggler gone (SF10SPOT.md)."""
    from pyspark.sql.functions import pandas_udf

    emb = table(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    C = np.stack(seeds["embedding"].to_numpy()).astype(np.float64)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("integer")
    def assign(e: pd.Series) -> pd.Series:
        m = np.stack(e.to_numpy()).astype(np.float64)
        d = -2.0 * (m @ C.T) + c_sq[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    from pyspark.sql import Window as W

    a = emb.select(
        "vec_id", "embedding", assign("embedding").alias("cid")
    )
    # Block ids must be WITHIN-CLUSTER dense ranks, not global vec_id
    # stripes: a global stripe grid makes every cluster span all ~N/B
    # stripes, so a mid-size cluster of n_c rows explodes into
    # (N/B)^2/2 near-empty block pairs and each row ships ~N/B copies
    # (observed at the sf10 spot: 2 B replicated rows, single-task
    # tail). Dense ranks give ceil(n_c/B) blocks per cluster — the
    # replication factor is the CLUSTER's own block count. The ranking
    # window is one cid-keyed exchange; blocks stay vec_id-ordered so
    # y < x block pairs are strictly ordered and the kernel's global
    # j < i mask loses nothing.
    a = a.withColumn(
        "blk",
        ((F.row_number().over(W.partitionBy("cid").orderBy("vec_id")) - 1) / block)
        .cast("long"),
    )
    # the assigned frame feeds THREE plan branches (block list, targets,
    # candidates); without a persist Spark re-executes the pandas-UDF
    # assignment + ranking once per branch (no cross-branch CSE) — the
    # same "write the assignment once" materialization a production
    # pipeline does explicitly
    a = a.persist()
    blocks = a.select("cid", "blk").distinct()
    # (cid, target block x, candidate block y<=x) units; the theta join is
    # a hash join on cid with a bounded per-cluster block list either side
    x = blocks.select(F.col("cid").alias("x_cid"), F.col("blk").alias("xblk"))
    y = blocks.select(F.col("cid").alias("y_cid"), F.col("blk").alias("yblk"))
    bp = (
        x.join(y, (x["x_cid"] == y["y_cid"]) & (y["yblk"] <= x["xblk"]))
        .select(F.col("x_cid").alias("p_cid"), "xblk", "yblk")
    )
    targets = a.join(
        bp, (a["cid"] == bp["p_cid"]) & (a["blk"] == bp["xblk"])
    ).select(
        "vec_id", "embedding", "cid", "xblk", "yblk", F.lit(1).alias("is_target")
    )
    cands = a.join(
        bp, (a["cid"] == bp["p_cid"]) & (a["blk"] == bp["yblk"])
    ).select(
        "vec_id", "embedding", "cid", "xblk", "yblk", F.lit(0).alias("is_target")
    )

    def prune_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf[pdf["is_target"] == 1].sort_values("vec_id").reset_index(drop=True)
        c = pdf[pdf["is_target"] == 0].sort_values("vec_id").reset_index(drop=True)
        if not len(t) or not len(c):
            return pd.DataFrame(
                columns=["vec_id", "cluster", "kept_by", "n_dups"]
            ).astype({"vec_id": "int64", "cluster": "int64", "kept_by": "int64", "n_dups": "int64"})
        tm = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        cm = np.stack(c["embedding"].to_numpy()).astype(np.float64)
        s = (tm @ cm.T) / np.outer(
            np.linalg.norm(tm, axis=1), np.linalg.norm(cm, axis=1)
        )
        tid = t["vec_id"].to_numpy()
        cids_ = c["vec_id"].to_numpy()
        # candidate j qualifies for target i iff j < i (strict, global order)
        mask = (np.round(s, 6) >= tau) & (cids_[None, :] < tid[:, None])
        rows = []
        hit = mask.any(axis=1)
        for i in np.nonzero(hit)[0]:
            js = np.nonzero(mask[i])[0]
            rows.append(
                (
                    int(tid[i]),
                    int(t["cid"].iloc[i]),
                    int(cids_[js[0]]),  # cands sorted by vec_id → local min
                    int(len(js)),
                )
            )
        return pd.DataFrame(rows, columns=["vec_id", "cluster", "kept_by", "n_dups"])

    partials = (
        targets.unionByName(cands)
        .groupBy("cid", "xblk", "yblk")
        .applyInPandas(
            prune_pair, "vec_id long, cluster long, kept_by long, n_dups long"
        )
    )
    out = partials.groupBy("vec_id", "cluster").agg(
        F.min("kept_by").alias("kept_by"), F.sum("n_dups").alias("n_dups")
    )
    # Materialize the (small) drop-set eagerly, then RELEASE the cached
    # assignment frame: without the unpersist the full-corpus cache blocks
    # stay pinned in executor storage for the rest of the session and
    # accumulate across sweep runs (ADVICE r5). localCheckpoint keeps only
    # the drop-set rows resident — rows exist only for dropped vectors.
    out = out.localCheckpoint(eager=True)
    a.unpersist()
    return out


@register(
    "c01_semantic_dedup",
    oracle=_SEM_ORACLE,
    doc=f"SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means "
    f"clustering (one deterministic assignment pass, K={K}) partitions "
    f"the embedding space, then only WITHIN-cluster pairs are scored — "
    f"every vector with cosine >= {SEM_TAU} to a lower-vec_id cluster-mate "
    "is dropped in favor of that keeper. Output one row per dropped "
    "vector with its keeper and duplicate count. 100 TB shape: the "
    "pairwise stage joins on the cluster id (a hash shuffle, never a "
    "cartesian) and the published recipe grows K with the corpus so "
    "clusters stay executor-sized; assignment itself never shuffles the "
    "corpus (broadcast centroids + map-side argmin).",
)
def c01_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup_df(spark, sf_dir)


@register(
    "c01_semantic_dedup_scaled",
    oracle=_SEM_ORACLE_NOCLUSTER,
    doc=f"The PROMOTED scale variant of c01_semantic_dedup (VERDICT r4 "
    "item 5): matmul assignment + BLOCK-PAIR cosine pruning "
    "(semantic_dedup_blocked_df — one bounded block x block kernel per "
    "task, so a skewed giant cluster spreads over (n_c/B)^2/2 tasks "
    "instead of stalling one core; the r5 sf10 spot measured 825 s -> "
    f"123 s) — run at the fold path's K={K} so the static oracle "
    "applies, now itself under the driver's exact gate. Output is the "
    "drop-set (vec_id, kept_by, n_dups); the cluster label is omitted "
    "because the variant labels clusters by seed INDEX, the fold by "
    "seed vec_id (drop-set equality at equal k is pinned by "
    "tests/test_clustering.py, blocked == per-cluster by the r5 "
    "block-pair pinning test).",
)
def c01_semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic_dedup_blocked_df(spark, sf_dir, k=K).select(
        "vec_id", "kept_by", "n_dups"
    )

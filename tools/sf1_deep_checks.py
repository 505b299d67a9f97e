"""Scale verification for the three dedup queries whose DuckDB oracles are
intractable at sf1 (single-core label-prop / 100M-row windows blow the
sweep budget): check them IN SPARK with independent code paths instead.

Per query:

* ``c01_ngram_jaccard`` — soundness: every emitted pair's Jaccard is
  recomputed from raw text with Python sets inside a mapInPandas (not the
  JVM array_intersect path the query used) and must be >= threshold and
  equal to the reported value. Completeness: a deterministic sample of
  base docs is brute-forced against the ENTIRE corpus (broadcast sample,
  Python-set Jaccard); every qualifying pair must appear in the output.
* ``c01_embedding_neardup`` — soundness: numpy recompute of cosine for
  every emitted pair (matmul, not the JVM zip_with fold) must be >= 0.45
  and match ``cos_sim`` to 6 dp. Plus LSH recall: true tau-pairs touching
  a vector sample (numpy brute force) vs how many the banding captured —
  reported, not asserted (banding is approximate by design).
* ``c01_dedup_clusters`` — exact graph invariants: every pair edge's
  endpoints share a label; every component's label IS the component's
  minimum member id (so labels are canonical, not merely consistent).
* ``c01_semantic_dedup[k=64]`` — the SemDeDup SCALE path (the registered
  K=8 fold config is O(N^2/K) by construction and excluded at sf1):
  per-pair cosine soundness via an independent join path, plus an exact
  drop-set recompute with a direct-distance cluster reassignment.

Usage: python tools/sf1_deep_checks.py [--sf-dir DIR] [--sample N]
Writes JSON to --out (default /tmp/sf1_deep_checks.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS_DIR))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _shingle_set(text: str, k: int) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def check_ngram_jaccard(spark, sf_dir: str, sample_every: int) -> dict:
    from tectonic_spark.operators.dedup import JACCARD_THRESHOLD, c01_ngram_jaccard
    from tectonic_spark.tables import table

    SHINGLE_K = 3  # shingles_col default; docs with <3 words have no shingles

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = c01_ngram_jaccard(spark, sf_dir).localCheckpoint()
    n_pairs = out.count()

    # --- soundness: python-set recompute of every emitted pair
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    joined = out.join(ta, "doc_a").join(tb, "doc_b")

    def verify(batches):
        for p in batches:
            bad = 0
            for ja, a, b in zip(p["jaccard"], p["text_a"], p["text_b"]):
                sa, sb = _shingle_set(a, SHINGLE_K), _shingle_set(b, SHINGLE_K)
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
                if j < JACCARD_THRESHOLD or abs(j - ja) > 1e-9:
                    bad += 1
            yield pd.DataFrame({"bad": [bad], "n": [len(p)]})

    sound = (
        joined.mapInPandas(verify, "bad long, n long")
        .agg(F.sum("bad").alias("bad"), F.sum("n").alias("n"))
        .collect()[0]
    )

    # --- completeness: deterministic doc sample brute-forced vs the corpus
    sample = docs.where(F.col("doc_id") % sample_every == 0).collect()
    sample_sets = {
        r.doc_id: s
        for r in sample
        if (s := _shingle_set(r.text, 3))
    }
    bc = spark.sparkContext.broadcast(sample_sets)

    def brute(batches):
        smp = bc.value
        for p in batches:
            rows = []
            for did, text in zip(p["doc_id"], p["text"]):
                s = _shingle_set(text, 3)
                if not s:
                    continue
                for sid, ss in smp.items():
                    if sid == did:
                        continue
                    inter = len(s & ss)
                    j = inter / (len(s) + len(ss) - inter)
                    if j >= JACCARD_THRESHOLD:
                        rows.append((min(did, sid), max(did, sid)))
            yield pd.DataFrame(rows, columns=["doc_a", "doc_b"]).astype("int64")

    truth = (
        docs.mapInPandas(brute, "doc_a long, doc_b long").distinct().localCheckpoint()
    )
    n_truth = truth.count()
    missing = truth.join(out, ["doc_a", "doc_b"], "left_anti").count()
    return {
        "n_pairs": n_pairs,
        "soundness_checked": sound.n,
        "soundness_bad": sound.bad,
        "sample_docs": len(sample_sets),
        "sample_true_pairs": n_truth,
        "sample_missing_from_output": missing,
    }


def check_embedding_neardup(spark, sf_dir: str, n_sample: int) -> dict:
    import numpy as np

    from tectonic_spark.operators.dedup import c01_embedding_neardup
    from tectonic_spark.tables import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = c01_embedding_neardup(spark, sf_dir).localCheckpoint()
    n_pairs = out.count()

    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    joined = out.join(ea, "vec_a").join(eb, "vec_b")

    def verify(batches):
        for p in batches:
            a = np.stack(p["emb_a"].to_numpy()).astype("float64")
            b = np.stack(p["emb_b"].to_numpy()).astype("float64")
            cos = np.round(
                (a * b).sum(1)
                / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)),
                6,
            )
            rep = p["cos_sim"].to_numpy()
            # the query folds left-to-right while numpy pairwise-sums; allow
            # 1e-5 before calling it wrong (rounding both to 6 dp can land
            # either side of the boundary for a genuine last-ulp difference)
            bad = int(((cos < 0.45 - 1e-5) | (np.abs(cos - rep) > 1e-5)).sum())
            yield pd.DataFrame({"bad": [bad], "n": [len(p)]})

    sound = (
        joined.mapInPandas(verify, "bad long, n long")
        .agg(F.sum("bad").alias("bad"), F.sum("n").alias("n"))
        .collect()[0]
    )

    # --- recall of the banding vs true tau-pairs for a vector sample
    sample = emb.orderBy("vec_id").limit(n_sample).collect()
    ids = np.array([r.vec_id for r in sample])
    mat = np.stack([np.asarray(r.embedding, dtype="float64") for r in sample])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def brute(batches):
        sids, smat = bc.value
        for p in batches:
            m = np.stack(p["embedding"].to_numpy()).astype("float64")
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            cos = np.round(m @ smat.T, 6)  # (batch, sample)
            bi, si = np.nonzero(cos >= 0.45)
            vid = p["vec_id"].to_numpy()[bi]
            sid = sids[si]
            keep = vid != sid
            lo = np.minimum(vid[keep], sid[keep])
            hi = np.maximum(vid[keep], sid[keep])
            yield pd.DataFrame({"vec_a": lo, "vec_b": hi})

    truth = (
        emb.mapInPandas(brute, "vec_a long, vec_b long").distinct().localCheckpoint()
    )
    n_truth = truth.count()
    captured = truth.join(out, ["vec_a", "vec_b"], "left_semi").count()
    return {
        "n_pairs": n_pairs,
        "soundness_checked": sound.n,
        "soundness_bad": sound.bad,
        "sample_vectors": int(n_sample),
        "sample_true_pairs": n_truth,
        "sample_captured_by_lsh": captured,
        "lsh_recall": round(captured / n_truth, 4) if n_truth else None,
    }


def check_dedup_clusters(spark, sf_dir: str) -> dict:
    from tectonic_spark.operators.dedup import c01_ngram_jaccard, connected_components

    pairs = (
        c01_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    )
    t0 = time.perf_counter()
    labels, rounds = connected_components(pairs)
    labels = labels.localCheckpoint()
    cc_sec = round(time.perf_counter() - t0, 1)

    la = labels.withColumnsRenamed({"node": "doc_a", "label": "label_a"})
    lb = labels.withColumnsRenamed({"node": "doc_b", "label": "label_b"})
    edge_violations = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .where(F.col("label_a") != F.col("label_b"))
        .count()
    )
    # canonical-label check: each component's label equals its min member
    bad_min = (
        labels.groupBy("label")
        .agg(F.min("node").alias("mn"))
        .where(F.col("label") != F.col("mn"))
        .count()
    )
    n_nodes = labels.count()
    n_clusters = labels.select("label").distinct().count()
    return {
        "n_nodes": n_nodes,
        "n_clusters": n_clusters,
        "rounds": rounds,
        "cc_sec": cc_sec,
        "edge_label_violations": edge_violations,
        "noncanonical_labels": bad_min,
    }


def check_semantic_dedup(spark, sf_dir: str, k: int = 64) -> dict:
    """sf1 evidence for the SemDeDup scale path (the registered fold
    config is oracle-pinned at K=8, whose O(N^2/K) pair volume is
    intractable at sf1 by construction — this is the named exclusion).

    * soundness: every emitted (vec_id, kept_by) pair is rejoined to its
      raw embeddings and the cosine recomputed in a mapInPandas (per-pair
      row dot, not the per-cluster matmul the operator used); it must
      reach tau, and kept_by < vec_id must hold.
    * exactness: the full drop-set is recomputed independently — the
      cluster assignment re-derived with the direct ||x-c||^2 formula
      (chunked numpy broadcasting, not the -2xc+c^2 expansion), the
      within-cluster prune re-run per cluster — and compared as SETS
      (both anti-join directions plus kept_by/n_dups value equality).
    """
    import numpy as np

    from tectonic_spark.operators.clustering import (
        SEM_TAU,
        semantic_dedup_scaled_df,
    )
    from tectonic_spark.tables import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    t0 = time.perf_counter()
    out = semantic_dedup_scaled_df(spark, sf_dir, k=k).localCheckpoint()
    n_dropped = out.count()
    run_sec = round(time.perf_counter() - t0, 1)

    ea = emb.select(F.col("vec_id"), F.col("embedding").alias("emb_a"))
    eb = emb.select(
        F.col("vec_id").alias("kept_by"), F.col("embedding").alias("emb_b")
    )
    joined = out.join(ea, "vec_id").join(eb, "kept_by")

    def verify(batches):
        for p in batches:
            a = np.stack(p["emb_a"].to_numpy()).astype("float64")
            b = np.stack(p["emb_b"].to_numpy()).astype("float64")
            cos = np.round(
                (a * b).sum(1)
                / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)),
                6,
            )
            bad = int(
                ((cos < SEM_TAU - 1e-5)
                 | (p["kept_by"].to_numpy() >= p["vec_id"].to_numpy())).sum()
            )
            yield pd.DataFrame({"bad": [bad], "n": [len(p)]})

    sound = (
        joined.mapInPandas(verify, "bad long, n long")
        .agg(F.sum("bad").alias("bad"), F.sum("n").alias("n"))
        .collect()[0]
    )

    # --- independent full recompute (direct-distance assignment)
    seeds = (
        emb.filter(F.col("vec_id") < k).toPandas().sort_values("vec_id")
    )
    C = np.stack(seeds["embedding"].to_numpy()).astype("float64")
    bc = spark.sparkContext.broadcast(C)

    def reassign(batches):
        cm = bc.value
        for p in batches:
            m = np.stack(p["embedding"].to_numpy()).astype("float64")
            cids = np.empty(len(m), dtype="int64")
            for lo in range(0, len(m), 1024):
                chunk = m[lo : lo + 1024]
                d = ((chunk[:, None, :] - cm[None, :, :]) ** 2).sum(-1)
                cids[lo : lo + len(chunk)] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": p["vec_id"],
                    "embedding": p["embedding"],
                    "cid": cids,
                }
            )

    def reprune(pdf):
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        nrm = np.linalg.norm(m, axis=1)
        s = (m @ m.T) / np.outer(nrm, nrm)
        ids = pdf["vec_id"].to_numpy()
        rows = [
            (int(ids[i]), int(pdf["cid"].iloc[i]), int(ids[q[0]]), len(q))
            for i in range(1, len(pdf))
            if len(q := np.nonzero(np.round(s[i, :i], 6) >= SEM_TAU)[0])
        ]
        return pd.DataFrame(
            rows, columns=["vec_id", "cluster", "kept_by", "n_dups"]
        )

    truth = (
        emb.mapInPandas(reassign, "vec_id long, embedding array<float>, cid long")
        .groupBy("cid")
        .applyInPandas(reprune, "vec_id long, cluster long, kept_by long, n_dups long")
        .localCheckpoint()
    )
    n_truth = truth.count()
    missing = truth.join(out, "vec_id", "left_anti").count()
    spurious = out.join(truth, "vec_id", "left_anti").count()
    value_mismatch = (
        out.alias("o")
        .join(truth.alias("t"), "vec_id")
        .where(
            (F.col("o.kept_by") != F.col("t.kept_by"))
            | (F.col("o.n_dups") != F.col("t.n_dups"))
            | (F.col("o.cluster") != F.col("t.cluster"))
        )
        .count()
    )
    return {
        "k": k,
        "n_dropped": n_dropped,
        "run_sec": run_sec,
        "soundness_checked": sound.n,
        "soundness_bad": sound.bad,
        "recompute_dropped": n_truth,
        "missing_from_output": missing,
        "spurious_in_output": spurious,
        "value_mismatches_bad": value_mismatch,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=None
    )
    ap.add_argument("--sample-every", type=int, default=7919)
    ap.add_argument("--vec-sample", type=int, default=200)
    ap.add_argument("--out", default="/tmp/sf1_deep_checks.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.sf_dir is None:
        from sf_scale import ensure_scaled

        args.sf_dir = ensure_scaled("/root/testdata/sf0.1", 10)

    from tectonic_spark import get_spark

    spark = get_spark(app_name="tectonic-sf1-deep-checks")
    results: dict[str, dict] = {}
    checks = {
        "c01_ngram_jaccard": lambda: check_ngram_jaccard(
            spark, args.sf_dir, args.sample_every
        ),
        "c01_embedding_neardup": lambda: check_embedding_neardup(
            spark, args.sf_dir, args.vec_sample
        ),
        "c01_dedup_clusters": lambda: check_dedup_clusters(spark, args.sf_dir),
        "c01_semantic_dedup[k=64]": lambda: check_semantic_dedup(
            spark, args.sf_dir, k=64
        ),
    }
    names = args.names or list(checks)
    ok = True
    for name in names:
        t0 = time.perf_counter()
        rec = checks[name]()
        rec["wall_sec"] = round(time.perf_counter() - t0, 1)
        fails = [
            k
            for k, v in rec.items()
            if (k.endswith("_bad") or "violation" in k or "missing" in k
                or "noncanonical" in k)
            and v
        ]
        rec["status"] = "pass" if not fails else f"FAIL: {fails}"
        ok &= not fails
        results[name] = rec
        print(name, json.dumps(rec))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

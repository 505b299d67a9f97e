"""Training-data-pipeline operators beyond the reference surface (c4):
repetition-based quality signals, deterministic sequence packing, and
weighted source-mixture sampling — the three ops a pre-training data
pipeline runs between dedup (c1) and tokenized shards.

100 TB design notes (per-op details in each docstring):

* ``c04_repetition`` is a pure per-row computation — one Arrow-batched
  kernel (r13; the interpreted HOF pipeline before it was the slowest
  sf1 row), no hash shuffle, scan pruned to (doc_id, text, n_chars).
* ``c04_sequence_packing`` needs a *global* token offset per document; a
  naive ``Window.orderBy(doc_id)`` cumulative sum collapses to ONE
  partition. We instead run a three-level exclusive scan: bucket
  documents by ``doc_id // 1024``, superbucket by ``bucket // 1024``,
  prefix-sum superbucket totals (N/1024² rows — the only sequential
  stage, ~10⁴ rows even at 10¹⁰ documents), then per-superbucket and
  per-bucket *partitioned* (parallel) windows with the parent offsets
  broadcast back down. Result is bit-identical to the global cumsum the
  oracle runs; every data-proportional stage is parallel.
* ``c04_mixture_sampling`` is a stateless hash filter — no shuffle, and
  the md5-based keep/drop decision is reproducible across engines,
  re-runs, and cluster sizes (the property a training pipeline needs so
  a resumed job samples the same documents).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tectonic_spark.operators.registry import bounded_key, register
from tectonic_spark.operators.text import o_shingles, shingles_col
from tectonic_spark.tables import table

SEQ_LEN = 128  # tokens per packed training sequence
PACK_BUCKET = 1024  # documents per offset bucket in the two-level scan
DECON_K = 4  # shingle width for benchmark decontamination
DECON_MOD = 50  # doc_id % DECON_MOD == 0 plays the held-out benchmark set


# DuckDB mirrors the run-length scan with the explode → group → window
# formulation (the oracle optimizes for clarity, not scale).
_REP_ORACLE = """
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents
),
g2 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i+1])) AS gram
  FROM t WHERE len(w) >= 2
),
c2 AS (
  SELECT doc_id, gram, count(*) AS cnt,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY count(*) DESC, gram DESC) AS rn
  FROM g2 GROUP BY doc_id, gram
),
top2 AS (
  SELECT doc_id, cnt * length(gram) AS top_chars FROM c2 WHERE rn = 1
),
g3 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
  FROM t WHERE len(w) >= 3
),
c3 AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY doc_id, gram
),
dup3 AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS dup_chars
  FROM c3 GROUP BY doc_id
)
SELECT t.doc_id,
       1.0 - CAST(len(list_distinct(t.w)) AS DOUBLE) / len(t.w) AS dup_word_frac,
       CAST(COALESCE(top2.top_chars, 0) AS DOUBLE) / t.n_chars AS top_2gram_frac,
       CAST(COALESCE(dup3.dup_chars, 0) AS DOUBLE) / t.n_chars AS dup_3gram_frac
FROM t
LEFT JOIN top2 USING (doc_id)
LEFT JOIN dup3 USING (doc_id)
"""


@register(
    "c04_repetition",
    oracle=_REP_ORACLE,
    doc="Repetition-based quality signals in the style of the Gopher data "
    "pipeline (Rae et al. 2021, public): duplicate-word fraction, fraction "
    "of characters in the most frequent 2-gram, fraction of characters in "
    "duplicated 3-grams. One Arrow-batched per-row kernel (guide §4.2) — "
    "no shuffle beyond the local small-scan fan-out; gram counting is a "
    "hash count per document, never an explode/groupBy shuffle. All "
    "metrics are INTEGER counts divided once in double, so the kernel is "
    "bit-identical to the oracle regardless of summation order. "
    "Most-frequent-gram ties break toward the lexicographically LARGER "
    "gram (max over (count, gram) == the oracle's ORDER BY cnt DESC, "
    "gram DESC). r13: replaced the interpreted higher-order-function "
    "sort + boundary-scan pipeline (array_sort + filter + zip_with + "
    "aggregate per row were CodegenFallback, ~18 s at sf1 -> ~2 s).",
)
def c04_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator
    from tectonic_spark.tables import spread_small_scan

    d = table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    # local fan-out only when the scan arrives in fewer splits than cores
    # (no-op at real scale; the kernel is partition-local either way)
    d = spread_small_scan(d, spark)

    def signals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in batches:
            n_rows = len(pdf)
            dup_w = [0.0] * n_rows
            top2 = [0.0] * n_rows
            dup3 = [0.0] * n_rows
            texts = pdf["text"].tolist()
            n_chars_col = pdf["n_chars"].tolist()
            saw_null = False
            for i in range(n_rows):
                t = texts[i]
                nc = n_chars_col[i]
                # r14 (ADVICE r13): real crawl text can be NULL and
                # n_chars can be 0 — the old SQL path (and the oracle)
                # emit NULL there (split(NULL) is NULL; x/0 is NULL in
                # both engines), where .split()/float-division raised.
                nc_f = float(nc) if nc is not None and nc == nc else None
                div_ok = nc_f is not None and nc_f != 0.0
                if t is None or t != t:
                    dup_w[i] = None
                    top2[i] = 0.0 if div_ok else None
                    dup3[i] = 0.0 if div_ok else None
                    saw_null = True
                    continue
                if not div_ok:
                    top2[i] = None
                    dup3[i] = None
                    saw_null = True
                w = t.split(" ")
                n = len(w)
                # 1.0 - (distinct/total): same two IEEE ops as the SQL
                dup_w[i] = 1.0 - float(len(set(w))) / float(n)
                if n >= 2 and div_ok:
                    c2 = Counter(
                        w[j] + " " + w[j + 1] for j in range(n - 1)
                    )
                    cnt, gram = max((c, g) for g, c in c2.items())
                    top2[i] = float(cnt * len(gram)) / nc_f
                if n >= 3 and div_ok:
                    c3 = Counter(
                        w[j] + " " + w[j + 1] + " " + w[j + 2]
                        for j in range(n - 2)
                    )
                    s = sum(c * len(g) for g, c in c3.items() if c > 1)
                    dup3[i] = float(s) / nc_f
            # nullable Float64 only when a NULL actually occurred: a
            # float64 NaN would cross Arrow as NaN, not SQL NULL
            dt = "Float64" if saw_null else "float64"
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dup_word_frac": pd.array(dup_w, dtype=dt),
                    "top_2gram_frac": pd.array(top2, dtype=dt),
                    "dup_3gram_frac": pd.array(dup3, dtype=dt),
                }
            )

    return d.mapInPandas(
        signals,
        "doc_id long, dup_word_frac double, top_2gram_frac double, "
        "dup_3gram_frac double",
    )


_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
o AS (
  SELECT doc_id, w,
         COALESCE(SUM(len(w)) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
),
tok AS (
  SELECT doc_id, s.gpos, s.tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, len(w)),
                  i -> struct_pack(gpos := off + i, tok := w[i+1]))) AS s
    FROM o
  )
)
SELECT CAST(gpos // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       md5(string_agg(tok, ' ' ORDER BY gpos)) AS seq_hash
FROM tok
GROUP BY 1
"""


@register(
    "c04_sequence_packing",
    oracle=_PACK_ORACLE,
    doc=f"Deterministic sequence packing: concatenate all documents in "
    f"doc_id order and cut into fixed {SEQ_LEN}-token training sequences "
    f"(documents span sequence boundaries, GPT-style). The global token "
    f"offset is a THREE-level exclusive scan (per-bucket totals -> "
    f"per-superbucket totals -> prefix windows at each level, each "
    f"partitioned by its parent, broadcast back down): the only "
    f"unpartitioned window runs over the superbucket relation of "
    f"N/{PACK_BUCKET}² rows (~10^4 rows even at 10^10 documents) — "
    f"every window over data-proportional cardinality is partitioned "
    f"(plan-asserted in tests/test_plans.py). Bit-identical to the "
    f"oracle's global cumulative sum.",
)
def c04_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .withColumn("n", F.size("w").cast("long"))
        .withColumn("bucket", F.floor(F.col("doc_id") / PACK_BUCKET))
    )
    # level 1: per-bucket token totals (N/1024 rows)
    totals = d.groupBy("bucket").agg(F.sum("n").alias("bn")).withColumn(
        "sb", F.floor(F.col("bucket") / PACK_BUCKET)
    )
    # level 2: per-superbucket totals (N/1024² rows — the ONLY relation a
    # sequential prefix ever scans; ~10⁴ rows at 10¹⁰ documents)
    sb_totals = totals.groupBy("sb").agg(F.sum("bn").alias("sbn"))
    # bounded_key partition: same single-partition execution over the
    # bounded superbucket relation, but the non-foldable key keeps the
    # partition spec in the plan so WindowExec's no-partition warning
    # stays quiet and REAL unbounded-window regressions stand out
    w_sb = (
        Window.partitionBy(bounded_key(F.col("sb")))
        .orderBy("sb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sb_off = sb_totals.select(
        "sb", F.coalesce(F.sum("sbn").over(w_sb), F.lit(0).cast("long")).alias("sboff")
    )
    # bucket offsets: superbucket base + prefix WITHIN the superbucket
    # (partitioned window — parallel across superbuckets)
    w_bucket = (
        Window.partitionBy("sb")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        totals.join(F.broadcast(sb_off), "sb")
        .withColumn(
            "boff",
            F.col("sboff")
            + F.coalesce(F.sum("bn").over(w_bucket), F.lit(0).cast("long")),
        )
        .select("bucket", "boff")
    )
    # level 2: per-bucket window (parallel across buckets) + broadcast offsets
    w_doc = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.join(F.broadcast(offsets), "bucket").withColumn(
        "off", F.col("boff") + F.coalesce(F.sum("n").over(w_doc), F.lit(0).cast("long"))
    )
    # r14 (guide §2.3 "shuffle keys and metadata instead of payloads"):
    # the old tail posexploded EVERY token into the seq_id exchange (~10M
    # 40+-byte UnsafeRows at sf1) and then paid an interpreted
    # array_sort + transform over 128 per-token structs PER SEQUENCE.
    # A document's contribution to one sequence is a CONTIGUOUS token
    # range, so pre-join it into ONE string segment map-side and shuffle
    # one row per doc×sequence overlap (~max(docs, seqs) rows — ~75x
    # fewer at sf1). Concatenation is associative: segments internally
    # joined by ' ' and then joined by ' ' in gpos order rebuild the
    # byte-identical sequence string, so md5 matches exactly (verified
    # row-identical against the old plan and the oracle at sf1/sf0.1/
    # sf0.01); n_tokens = sum of segment lengths; n_docs still counts
    # distinct doc_id (a doc contributes at most one segment per seq).
    # Interleaved cold-cache A/B at sf1: 3.0-3.5 -> 2.1-2.7 s.
    # spread_small_scan on the documents scan was A/B'd on top and is a
    # wash (2.12 plain vs 2.27 spread) — the heavy tail already runs
    # after the bucket-window exchange, not on the 2-split scan.
    seg = d.select(
        "doc_id",
        "w",
        "n",
        "off",
        F.explode(
            F.expr(
                f"""
          transform(
            sequence(CAST(floor(off / {SEQ_LEN}) AS BIGINT),
                     CAST(floor((off + n - 1) / {SEQ_LEN}) AS BIGINT)),
            q -> struct(
              q AS seq_id,
              greatest(CAST(0 AS BIGINT), q * {SEQ_LEN} - off) AS st,
              least(n, (q + 1) * {SEQ_LEN} - off) AS en))
        """
            )
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.seq_id").alias("seq_id"),
        (F.col("off") + F.col("s.st")).alias("gpos_start"),
        (F.col("s.en") - F.col("s.st")).alias("seg_n"),
        F.array_join(
            F.expr("slice(w, CAST(s.st + 1 AS INT), CAST(s.en - s.st AS INT))"),
            " ",
        ).alias("seg"),
    )
    return seg.groupBy("seq_id").agg(
        F.sum("seg_n").alias("n_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gpos_start", "seg"))),
                    lambda s: s["seg"],
                ),
            )
        ).alias("seq_hash"),
    )


# hex -> uint32 for the first 8 md5 hex chars, DuckDB-side (no conv() there)
def _o_hex32(col: str = "h") -> str:
    return (
        "list_sum(list_transform(range(1, 9), i -> "
        f"CAST(strpos('0123456789abcdef', substr({col}, CAST(i AS INT), 1)) - 1 AS BIGINT)"
        " * (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT))))"
    )


_O_HEX32 = _o_hex32("h")

_MIX_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS INT) % 4 AS m,
         md5(CAST(doc_id AS VARCHAR) || ':' || source) AS h
  FROM documents
),
r AS (
  SELECT doc_id, source,
         CASE m WHEN 0 THEN 10000 WHEN 1 THEN 5000
                WHEN 2 THEN 2500 ELSE 1000 END AS rate_bp,
         {_O_HEX32} AS hv
  FROM t
)
SELECT doc_id, source, CAST(rate_bp AS BIGINT) AS rate_bp
FROM r WHERE hv % 10000 < rate_bp
"""


@register(
    "c04_mixture_sampling",
    oracle=_MIX_ORACLE,
    doc="Deterministic weighted source-mixture sampling: each source gets "
    "a sampling rate (10000/5000/2500/1000 basis points by source index "
    "mod 4) and a document is kept iff uint32(md5(doc_id:source)[:8]) % "
    "10000 < rate. Stateless hash filter — no shuffle, pushes the scan "
    "down to (doc_id, source), and the same documents are selected "
    "regardless of partitioning, cluster size, or re-runs (the "
    "reproducibility property mixture-weighted pre-training data needs).",
)
def c04_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
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
    return d.where(h % 10000 < rate_bp).select(
        "doc_id", "source", rate_bp.cast("long").alias("rate_bp")
    )


_DECON_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
b AS (
  SELECT DISTINCT unnest({o_shingles("w", DECON_K)}) AS sh
  FROM w WHERE doc_id % {DECON_MOD} = 0 AND len(w) >= {DECON_K}
),
t AS (
  SELECT doc_id, unnest({o_shingles("w", DECON_K)}) AS sh
  FROM w WHERE doc_id % {DECON_MOD} <> 0 AND len(w) >= {DECON_K}
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_shingles
FROM t JOIN b USING (sh)
GROUP BY t.doc_id
"""


@register(
    "c04_decontamination",
    oracle=_DECON_ORACLE,
    doc=f"Benchmark decontamination — the step a pre-training pipeline runs "
    f"so evaluation data never leaks into the training set: flag every "
    f"training document sharing at least one distinct {DECON_K}-word "
    f"shingle with the held-out benchmark set (docs with doc_id % "
    f"{DECON_MOD} == 0 play the benchmark here), reporting how many of "
    f"its shingles are contaminated. 100 TB shape: the benchmark side is "
    f"small by construction (eval sets are thousands of docs, not "
    f"billions) so its distinct-shingle set BROADCASTS; training shingles "
    f"explode linearly and semi-join against it with no shuffle of the "
    f"corpus — the only exchange is the final per-doc count on doc_id. "
    f"Plan-asserted broadcast, no SortMergeJoin.",
)
def c04_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    docs = d.select("doc_id", shingles_col(w, DECON_K).alias("sh")).where(
        F.size(w) >= DECON_K
    )
    bench = (
        docs.where(F.col("doc_id") % DECON_MOD == 0)
        .select(F.explode("sh").alias("sh"))
        .distinct()
    )
    train = docs.where(F.col("doc_id") % DECON_MOD != 0).select(
        "doc_id", F.explode("sh").alias("sh")
    )
    return (
        train.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )


_CURATION_ORACLE = f"""
WITH dedup AS (  -- exact dedup: keep the earliest doc per text digest
  SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                 ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
q2 AS (          -- cheap quality gate: length + duplicate-word fraction
  SELECT doc_id, lang, source,
         CAST(len(w) AS BIGINT) AS n_tokens
  FROM (SELECT *, string_split(text, ' ') AS w FROM dedup)
  WHERE len(w) >= 15
    AND 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) < 0.6
),
contaminated AS ( -- benchmark leak set (same rule as c04_decontamination)
  SELECT DISTINCT t.doc_id FROM (
    SELECT doc_id, unnest({o_shingles("w", DECON_K)}) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE doc_id % {DECON_MOD} <> 0 AND len(w) >= {DECON_K}
  ) t JOIN (
    SELECT DISTINCT unnest({o_shingles("w", DECON_K)}) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    WHERE doc_id % {DECON_MOD} = 0 AND len(w) >= {DECON_K}
  ) b USING (sh)
),
sampled AS (      -- weighted mixture sampling (same rule as c04_mixture)
  SELECT q2.*,
         CASE CAST(substr(source, 4) AS INT) % 4
              WHEN 0 THEN 10000 WHEN 1 THEN 5000
              WHEN 2 THEN 2500 ELSE 1000 END AS rate_bp,
         md5(CAST(doc_id AS VARCHAR) || ':' || source) AS h
  FROM q2
)
SELECT doc_id, lang, source, n_tokens
FROM sampled
WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND {_O_HEX32} % 10000 < rate_bp
"""


@register(
    "c05_corpus_curation",
    oracle=_CURATION_ORACLE,
    doc=f"End-to-end corpus curation as ONE DataFrame program — the "
    f"composition a real pre-training pipeline runs: exact dedup (earliest "
    f"doc per sha256, one digest shuffle) -> quality gate (>=15 tokens, "
    f"dup-word fraction < 0.6; per-row, no shuffle) -> benchmark "
    f"decontamination (broadcast anti join against the eval shingle set) "
    f"-> weighted mixture sampling (stateless md5 filter). Demonstrates "
    f"that the c-surface operators compose inside a single Catalyst plan: "
    f"filters stay pushed, the only corpus-sized shuffles are the dedup "
    f"digest and the window, and every probability/threshold is "
    f"deterministic so the oracle replicates the whole pipeline.",
)
def c05_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _curation_chain(spark, sf_dir, table(spark, sf_dir, "documents"))


def _curation_chain(spark: SparkSession, sf_dir: str, d: DataFrame) -> DataFrame:
    """The dedup -> quality -> decontamination -> mixture chain over any
    frame with (doc_id, text, lang, source) — shared by the table-scan
    composition (c05_corpus_curation) and the crawl-fed one
    (c05_crawl_curation)."""
    from pyspark.sql import Window as W

    # 1. exact dedup: earliest doc_id per digest
    rn = F.row_number().over(
        W.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    )
    deduped = d.withColumn("rn", rn).where(F.col("rn") == 1).drop("rn")
    # 2. quality gate
    w = F.split(F.col("text"), " ")
    q = deduped.select(
        "doc_id", "lang", "source", "text", F.size(w).cast("long").alias("n_tokens")
    ).where(
        (F.size(w) >= 15)
        & (F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / F.size(w) < 0.6)
    )
    # 3. decontamination: anti join against the contaminated-doc set
    contaminated = c04_decontamination(spark, sf_dir).select("doc_id")
    clean = q.join(contaminated, "doc_id", "left_anti")
    # 4. mixture sampling
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
    return clean.where(h % 10000 < rate_bp).select(
        "doc_id", "lang", "source", "n_tokens"
    )


@register(
    "c05_crawl_curation",
    oracle=_CURATION_ORACLE,
    doc="The c05 curation composition fed from the RAW CRAWL instead of "
    "the parquet table — the actual end-to-end shape of a pre-training "
    "data pipeline (Common Crawl in, curated corpus out): member-per-"
    "record .warc.gz shards -> gzip member walk -> ISO 28500 record "
    "grammar -> HTTP de-framing (chunked + Content-Length) -> HTML "
    "main-content extraction (warc_extract_kernel reconstructs doc_id/"
    "text/lang/source from the crawl alone: URI path, URI host, <html "
    "lang>, extracted text) -> exact dedup -> quality gate -> benchmark "
    "decontamination -> weighted mixture sampling. The oracle is the "
    "SAME _CURATION_ORACLE over the documents table: it can only match "
    "if extraction inverted the page wrapper byte-exactly for every "
    "surviving doc (sha256 dedup hashes the extracted text). 100 TB "
    "shape: shards are whole-file tasks; extraction is stateless "
    "mapInPandas; the chain's only corpus shuffles are the dedup digest "
    "window and the decontamination broadcast anti join, identical to "
    "c05_corpus_curation.",
)
def c05_crawl_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from tectonic_spark.operators.parser_ops import (
        _warc_shards_src,
        warc_extract_kernel,
    )

    src, _n = _warc_shards_src(sf_dir)
    files = spark.read.format("binaryFile").load(os.path.join(src, "*.warc.gz"))
    docs = warc_extract_kernel(files)
    return _curation_chain(spark, sf_dir, docs)


STRAT_K = 25  # per-stratum quota


_STRAT_ORACLE = f"""
WITH r AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || lang), doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {STRAT_K}
"""


@register(
    "c04_stratified_sample",
    oracle=_STRAT_ORACLE,
    doc=f"Stratified sampling: exactly {STRAT_K} documents per (lang, "
    f"source) stratum, chosen by ranking on md5(doc_id:lang) — a uniform "
    "random draw that is deterministic across partitionings and re-runs "
    "(how eval/holdout splits and per-language quota mixes are cut from a "
    "pre-training corpus). 100 TB shape: one hash-partitioned exchange on "
    "the stratum key; stratum count is bounded (langs x sources), and the "
    "rank sort's key is 32 hex chars + doc_id, so AQE splits any skewed "
    "stratum. Same window shape as b07_topn_per_group, which is "
    "plan-asserted.",
)
def c04_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("lang")))
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= STRAT_K)
        .select("doc_id", "lang", "source", F.col("rk").cast("long").alias("rk"))
    )


N_SHARDS = 16  # output shard count; at 100 TB this is the writer parallelism


_SHUF_ORACLE = f"""
WITH t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':shuffle:42') AS h
  FROM documents
),
s AS (
  SELECT doc_id, h, {_O_HEX32} % {N_SHARDS} AS shard FROM t
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM s
"""


@register(
    "c04_corpus_shuffle",
    oracle=_SHUF_ORACLE,
    doc=f"Deterministic global corpus shuffle: every document gets a shard "
    f"(uint32(md5(doc_id:shuffle:42)[:8]) % {N_SHARDS}) and a position "
    "within the shard (rank of the full md5, doc_id tie-break) — the "
    "seeded random training order a data-loader consumes, reproducible "
    "across partitionings, cluster sizes, and re-runs (no "
    "rand()/shuffle-nondeterminism anywhere). 100 TB shape: ONE hash "
    "exchange on the shard id; within-shard order is a sort on a "
    "uniformly-distributed key, so shards are balanced by construction "
    "(hash of a unique id) and each shard sorts independently — exactly "
    "the repartition(shard).sortWithinPartitions writer layout, with AQE "
    "free to split any shard whose sort spills.",
)
def c04_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("shuffle:42")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % N_SHARDS
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", h.alias("h"), shard.alias("shard"))
        .select(
            "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
        )
    )


_DELTA_ORACLE = """
WITH cur AS (
  SELECT doc_id, md5(text) AS digest FROM documents
),
prev AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 5 THEN md5(text || ' OLD')
              ELSE md5(text) END AS digest
  FROM documents WHERE doc_id % 17 <> 3
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, md5(text) AS digest
  FROM documents WHERE doc_id % 13 = 7
)
SELECT COALESCE(cur.doc_id, prev.doc_id) AS doc_id,
       CASE WHEN prev.doc_id IS NULL THEN 'added'
            WHEN cur.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id
WHERE prev.doc_id IS NULL OR cur.doc_id IS NULL
   OR cur.digest <> prev.digest
"""


@register(
    "c04_snapshot_delta",
    oracle=_DELTA_ORACLE,
    doc="Incremental snapshot diff — the change-detection pass an "
    "incremental ingestion pipeline runs before reprocessing a corpus "
    "crawl: current vs previous snapshot full-outer-joined on doc_id "
    "with content digests, emitting added / changed / removed rows only "
    "(unchanged documents — the overwhelming majority at 100 TB — are "
    "filtered before anything downstream runs). The previous snapshot "
    "is derived deterministically from the corpus (every 17th doc "
    "missing -> added, every 11th text-perturbed -> changed, every 13th "
    "mirrored at a shifted id -> removed) so the delta is non-trivial in "
    "all three classes and exactly oracle-checkable. 100 TB shape: "
    "digests are computed in the scan projection (only doc_id+digest "
    "shuffle, never text), ONE doc_id-keyed exchange per side feeds the "
    "SortMergeJoin, and the output is delta-sized, not corpus-sized.",
)
def c04_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    cur = d.select("doc_id", F.md5("text").alias("digest"))
    prev_kept = d.where(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 5, F.md5(F.concat(F.col("text"), F.lit(" OLD")))
        )
        .otherwise(F.md5("text"))
        .alias("digest"),
    )
    prev_removed = d.where(F.col("doc_id") % 13 == 7).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        F.md5("text").alias("digest"),
    )
    prev = prev_kept.unionAll(prev_removed).select(
        F.col("doc_id").alias("p_doc_id"), F.col("digest").alias("p_digest")
    )
    joined = cur.join(prev, cur.doc_id == prev.p_doc_id, "full_outer")
    return joined.where(
        F.col("p_doc_id").isNull()
        | F.col("doc_id").isNull()
        | (F.col("digest") != F.col("p_digest"))
    ).select(
        F.coalesce("doc_id", "p_doc_id").alias("doc_id"),
        F.when(F.col("p_doc_id").isNull(), "added")
        .when(F.col("doc_id").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
    )


# --- DSIR importance resampling (data selection for LM pre-training) ------

DSIR_BUCKETS = 256
DSIR_K = 100

# DSIR weight CTE chain, shared by c04_dsir and c05_curation_v2 —
# assumes a preceding CTE ``tok`` with (doc_id, lang, tok)
_O_DSIR_CTES = f"""
bt AS (SELECT doc_id, lang, {_o_hex32('md5(tok)')} % {DSIR_BUCKETS} AS b
       FROM tok),
raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rcnt FROM bt GROUP BY b),
tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tcnt
        FROM bt WHERE lang = 'en' GROUP BY b),
tots AS (SELECT (SELECT COUNT(*) FROM bt) AS r_tot,
                (SELECT COUNT(*) FROM bt WHERE lang = 'en') AS t_tot),
lr AS (SELECT raw.b,
              ln(COALESCE(tgt.tcnt, 0) + 1) - ln(t_tot + {DSIR_BUCKETS})
              - ln(raw.rcnt + 1) + ln(r_tot + {DSIR_BUCKETS}) AS logratio
       FROM raw LEFT JOIN tgt USING (b), tots),
w AS (SELECT bt.doc_id, bt.lang,
             round(SUM(lr.logratio), 6) AS dsir_weight
      FROM bt JOIN lr USING (b)
      GROUP BY bt.doc_id, bt.lang)"""

_O_DSIR_CTES_TAIL = _O_DSIR_CTES + ","

_DSIR_ORACLE = f"""
WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
             FROM documents),
{_O_DSIR_CTES}
SELECT doc_id, lang, dsir_weight,
       CAST(row_number() OVER (ORDER BY dsir_weight DESC, doc_id)
            AS BIGINT) AS sel_rank
FROM w ORDER BY dsir_weight DESC, doc_id LIMIT {DSIR_K}
"""


def dsir_weights_df(tok: "DataFrame") -> "DataFrame":
    """Per-doc DSIR importance weights from a (doc_id, lang, tok) frame —
    the shared core of c04_dsir and c05_curation_v2 (target = lang='en',
    add-one smoothing, 6dp-rounded)."""
    b = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    bt = tok.select("doc_id", "lang", b.alias("b"))
    raw = bt.groupBy("b").agg(F.count(F.lit(1)).alias("rcnt"))
    tgt = (
        bt.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tcnt"))
    )
    tots = bt.agg(
        F.count(F.lit(1)).alias("r_tot"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_tot"),
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.log(F.coalesce(F.col("tcnt"), F.lit(0)) + 1)
                - F.log(F.col("t_tot") + DSIR_BUCKETS)
                - F.log(F.col("rcnt") + 1)
                + F.log(F.col("r_tot") + DSIR_BUCKETS)
            ).alias("logratio"),
        )
    )
    return (
        bt.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum("logratio"), 6).alias("dsir_weight"))
    )


@register(
    "c04_dsir",
    oracle=_DSIR_ORACLE,
    doc=f"DSIR data selection (Xie et al. 2023, arXiv:2302.03169 — "
    "Data Selection for LMs via Importance Resampling, public): hashed "
    f"unigram features (uint32(md5(token)[:8]) mod {DSIR_BUCKETS} "
    "buckets), bag-of-buckets importance weight ln p_target/p_raw with "
    "add-one smoothing (target domain = lang='en' documents, raw = whole "
    f"corpus), top-{DSIR_K} selection by (rounded weight, doc_id) — the "
    "deterministic stand-in for the paper's Gumbel resampling. 100 TB "
    f"shape: both histograms are {DSIR_BUCKETS}-row map-side-combined "
    "aggregates; the per-bucket log-ratio table broadcasts; per-doc "
    "weights are one doc_id-keyed aggregation over the token stream "
    "(no token-keyed join at all, unlike the NB scorer); the global "
    "top-K is TakeOrderedAndProject (per-partition heaps, never a full "
    "sort). Only K rows ever see a single task.",
)
def c04_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    w = dsir_weights_df(tok)
    top = w.orderBy(F.col("dsir_weight").desc(), F.col("doc_id")).limit(DSIR_K)
    # rank assignment runs on the K surviving rows only (constant-size);
    # bounded_key keeps the partition spec non-foldable so WindowExec's
    # no-partition warning never fires (registry.bounded_key docstring)
    rank_win = Window.partitionBy(bounded_key(F.col("doc_id"))).orderBy(
        F.col("dsir_weight").desc(), F.col("doc_id")
    )
    return top.select(
        "doc_id",
        "lang",
        "dsir_weight",
        F.row_number().over(rank_win).cast("long").alias("sel_rank"),
    )


# --- incremental aggregate maintenance (materialized-view update) ---------

_INC_ROLLUP_ORACLE = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY lang, source
"""


@register(
    "c04_incremental_rollup",
    oracle=_INC_ROLLUP_ORACLE,
    doc="Incremental aggregate maintenance (materialized-view update, the "
    "warehouse-side dual of c04_snapshot_delta): the maintained rollup "
    "per (lang, source) — doc count + total chars — is NOT recomputed "
    "from the current snapshot; it is derived as prev_rollup merged with "
    "delta contributions (+1/+chars for added, -1/-chars for removed, "
    "0/chars-diff for changed), where the previous snapshot uses the "
    "snapshot_delta derivation rules (every 17th doc missing, every 11th "
    "chars-perturbed, every 13th mirrored at a shifted id). The oracle "
    "aggregates the CURRENT snapshot directly, so any error in the "
    "incremental algebra — a missed class, a sign flip, double-applying "
    "changed rows — mismatches. 100 TB shape: the delta join shuffles "
    "(doc_id, two longs) once per side; the merge aggregates "
    "group-cardinality-sized inputs (prev rollup) plus delta-sized "
    "contributions — the full corpus is scanned but never re-shuffled "
    "on the group key.",
)
def c04_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    cur = d.select("doc_id", "lang", "source", "n_chars")
    prev_kept = d.where(F.col("doc_id") % 17 != 3).select(
        "doc_id",
        "lang",
        "source",
        F.when(F.col("doc_id") % 11 == 5, F.col("n_chars") + 7)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    prev_removed = d.where(F.col("doc_id") % 13 == 7).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
        "lang",
        "source",
        "n_chars",
    )
    prev = prev_kept.unionAll(prev_removed)

    prev_agg = prev.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    p = prev.select(
        F.col("doc_id").alias("p_doc_id"),
        F.col("lang").alias("p_lang"),
        F.col("source").alias("p_source"),
        F.col("n_chars").alias("p_chars"),
    )
    joined = cur.join(p, cur.doc_id == p.p_doc_id, "full_outer")
    delta = joined.where(
        F.col("p_doc_id").isNull()
        | F.col("doc_id").isNull()
        | (F.col("n_chars") != F.col("p_chars"))
    ).select(
        F.coalesce("lang", "p_lang").alias("lang"),
        F.coalesce("source", "p_source").alias("source"),
        F.when(F.col("p_doc_id").isNull(), F.lit(1))
        .when(F.col("doc_id").isNull(), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_docs"),
        (
            F.coalesce("n_chars", F.lit(0)) - F.coalesce("p_chars", F.lit(0))
        ).alias("chars"),
    )
    return (
        prev_agg.unionAll(delta)
        .groupBy("lang", "source")
        .agg(
            F.sum("n_docs").alias("n_docs"), F.sum("chars").alias("chars")
        )
        .where(F.col("n_docs") > 0)
    )


# --- c05 v2: the round-4b curation chain in ONE plan ----------------------

CUR2_QUALITY_MIN = 0.45  # distinct-ratio floor on the deduped text
CUR2_K = 150  # final DSIR selection size

_CUR2_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, w,
             unnest(range(0, (len(w) + 9) // 10)) AS span_idx
      FROM t),
sp AS (SELECT doc_id, span_idx,
              array_to_string(
                list_slice(w, CAST(span_idx * 10 + 1 AS INT),
                              CAST(span_idx * 10 + 10 AS INT)), ' ') AS span
       FROM s),
f AS (SELECT doc_id, span_idx, span,
             row_number() OVER (PARTITION BY span
                                ORDER BY doc_id, span_idx) = 1 AS keep
      FROM sp),
ld AS (SELECT doc_id,
              CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              COALESCE(string_agg(CASE WHEN keep THEN span END, ' '
                                  ORDER BY span_idx), '') AS kept_text
       FROM f GROUP BY doc_id),
kept AS (SELECT d.lang, ld.doc_id, ld.n_kept, ld.kept_text
         FROM ld JOIN documents d USING (doc_id)
         WHERE ld.n_kept >= 2
           AND CAST(len(list_distinct(string_split(ld.kept_text, ' ')))
                    AS DOUBLE) / len(string_split(ld.kept_text, ' '))
               >= {CUR2_QUALITY_MIN}),
tok AS (SELECT doc_id, lang, unnest(string_split(kept_text, ' ')) AS tok
        FROM kept),
{_O_DSIR_CTES_TAIL}
sel AS (SELECT w.doc_id, w.lang, k.n_kept, w.dsir_weight
        FROM w JOIN kept k USING (doc_id)
        ORDER BY w.dsir_weight DESC, w.doc_id LIMIT {CUR2_K})
SELECT doc_id, lang, n_kept, dsir_weight,
       CAST(row_number() OVER (ORDER BY dsir_weight DESC, doc_id)
            AS BIGINT) AS sel_rank
FROM sel
"""


@register(
    "c05_curation_v2",
    oracle=_CUR2_ORACLE,
    doc="The round-4b curation chain composed in ONE Catalyst plan — the "
    "modern pipeline shape (C4 -> classifier filter -> DSIR, cf. "
    "Raffel 2020 / Brown 2020 / Xie 2023): (1) corpus-wide duplicate-"
    "span removal reassembles every document from its surviving spans; "
    "(2) a lexical-diversity gate on the DEDUPED text drops low-quality "
    f"docs (distinct-ratio >= {CUR2_QUALITY_MIN}, >=2 surviving spans); "
    f"(3) DSIR importance weights over the deduped text select the top-"
    f"{CUR2_K} target-domain-like documents. Each stage consumes the "
    "previous stage's OUTPUT (the quality gate and the DSIR histograms "
    "see post-dedup text, not raw text), so stage coupling — the thing "
    "a composition can get wrong silently — is exactly oracle-checked. "
    "100 TB shape: the span stage's min-struct agg + span join, one "
    "doc_id reassembly shuffle, stateless gate, bounded histograms, "
    "TakeOrdered top-K; at warehouse scale you materialize between "
    "stages — every stage's keep/drop is deterministic so the split "
    "plan produces identical bytes.",
)
def c05_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tectonic_spark.operators.dedup import line_dedup_df

    d = table(spark, sf_dir, "documents")
    ld = line_dedup_df(d.select("doc_id", "text"))
    kw = F.split("kept_text", " ")
    kept = (
        ld.join(d.select("doc_id", "lang"), "doc_id")
        .where(
            (F.col("n_kept") >= 2)
            & (
                F.size(F.array_distinct(kw)).cast("double") / F.size(kw)
                >= CUR2_QUALITY_MIN
            )
        )
        .select("doc_id", "lang", "n_kept", "kept_text")
    )
    tok = kept.select(
        "doc_id", "lang", F.explode(F.split("kept_text", " ")).alias("tok")
    )
    wt = dsir_weights_df(tok)
    sel = (
        wt.join(kept.select("doc_id", "n_kept"), "doc_id")
        .orderBy(F.col("dsir_weight").desc(), F.col("doc_id"))
        .limit(CUR2_K)
    )
    rank_win = Window.partitionBy(bounded_key(F.col("doc_id"))).orderBy(
        F.col("dsir_weight").desc(), F.col("doc_id")
    )
    return sel.select(
        "doc_id",
        "lang",
        "n_kept",
        "dsir_weight",
        F.row_number().over(rank_win).cast("long").alias("sel_rank"),
    )


# --- training-mixture epoch planning --------------------------------------

EPOCH_TOKEN_BUDGET = 1_000_000  # total training tokens to allocate


_EPOCH_ORACLE = f"""
WITH t AS (SELECT source,
                  CAST(substr(source, 4) AS INT) % 4 AS m,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
avail AS (SELECT source, ANY_VALUE(m) AS m,
                 SUM(n_tokens) AS available_tokens
          FROM t GROUP BY source),
wtd AS (SELECT source, available_tokens,
               CASE m WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 2 ELSE 1 END
                 AS weight
        FROM avail),
tot AS (SELECT SUM(weight) AS w_total FROM wtd)
SELECT w.source,
       CAST(w.available_tokens AS BIGINT) AS available_tokens,
       CAST(w.weight AS BIGINT) AS weight,
       CAST(({EPOCH_TOKEN_BUDGET} * w.weight) // tot.w_total AS BIGINT)
         AS target_tokens,
       CAST((({EPOCH_TOKEN_BUDGET} * w.weight) // tot.w_total) * 1000
            // w.available_tokens AS BIGINT) AS epochs_x1000
FROM wtd w, tot
"""


@register(
    "c04_epoch_plan",
    oracle=_EPOCH_ORACLE,
    doc="Training-mixture epoch planning — the data-mixing arithmetic of "
    "LLM pre-training (the 'epochs over each source' tables of LLaMA / "
    "Gopher): per-source available tokens (one aggregation), integer "
    f"target weights by source class, and a {EPOCH_TOKEN_BUDGET:,}-token "
    "budget allocated proportionally; epochs = target/available in "
    "x1000 fixed point. ALL integer floor arithmetic — bit-exact across "
    "engines with no rounding tolerance. epochs_x1000 > 1000 flags "
    "sources the plan would repeat (the upsampling Gopher applies to "
    "high-quality sets); the planner itself is one token-count "
    "aggregation plus source-cardinality-sized math — free at any "
    "corpus scale.",
)
def c04_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = F.substring("source", 4, 10).cast("int") % 4
    t = d.select(
        "source",
        m.alias("m"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    avail = t.groupBy("source").agg(
        F.first("m").alias("m"),
        F.sum("n_tokens").alias("available_tokens"),
    )
    weight = (
        F.when(F.col("m") == 0, 4)
        .when(F.col("m") == 1, 3)
        .when(F.col("m") == 2, 2)
        .otherwise(1)
        .cast("long")
    )
    wtd = avail.select("source", "available_tokens", weight.alias("weight"))
    tot = wtd.agg(F.sum("weight").alias("w_total"))
    return (
        wtd.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "available_tokens",
            "weight",
            F.expr(
                f"CAST(({EPOCH_TOKEN_BUDGET} * weight) div w_total AS BIGINT)"
            ).alias("target_tokens"),
            F.expr(
                f"CAST((({EPOCH_TOKEN_BUDGET} * weight) div w_total) * 1000"
                " div available_tokens AS BIGINT)"
            ).alias("epochs_x1000"),
        )
    )


# --- corpus datasheet (dataset-card statistics) ----------------------------

_DATASHEET_ORACLE = """
WITH t AS (SELECT doc_id, lang, source, n_chars,
                  string_split(text, ' ') AS w,
                  md5(text) AS digest
           FROM documents),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(SUM(len(w)) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(MIN(len(w)) AS BIGINT) AS min_tokens,
         CAST(MAX(len(w)) AS BIGINT) AS max_tokens,
         CAST(COUNT(*) - COUNT(DISTINCT digest) AS BIGINT)
           AS n_exact_dup_docs,
         CAST(SUM(CASE WHEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
                            >= 0.45 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_quality_pass
  FROM t),
v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
      FROM (SELECT unnest(w) AS tok FROM t))
SELECT base.*, v.vocab_size FROM base, v
"""


@register(
    "c04_datasheet",
    oracle=_DATASHEET_ORACLE,
    doc="Corpus datasheet — the one-row statistics card a dataset release "
    "ships (Gebru et al. 2021, 'Datasheets for Datasets', CACM — "
    "composition/size section): document/lang/source counts, token and "
    "char totals, token-length extremes, exact-duplicate count (docs "
    "minus distinct digests), quality-gate pass count (the s10/c05 "
    "distinct-ratio threshold), and vocabulary size. ONE pass over the "
    "corpus for the row-local stats plus one token-keyed distinct for "
    "the vocabulary; every figure is an exact integer. At 100 TB this "
    "is the cheap always-on report each ingestion cycle appends to the "
    "dataset's provenance log.",
)
def c04_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    t = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(w).alias("n_tokens"),
        (F.size(F.array_distinct(w)).cast("double") / F.size(w)).alias("dr"),
        F.md5("text").alias("digest"),
    )
    base = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("digest")).alias(
            "n_exact_dup_docs"
        ),
        F.sum(F.when(F.col("dr") >= 0.45, 1).otherwise(0))
        .cast("long")
        .alias("n_quality_pass"),
    )
    vocab = (
        d.select(F.explode(w).alias("tok"))
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    return base.crossJoin(F.broadcast(vocab))

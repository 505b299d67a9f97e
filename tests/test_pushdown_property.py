"""Property-based pushdown correctness: for random NDJSON documents, a
random projection set, and a random supported filter, the event parser +
PushdownPlate must produce exactly the rows/columns that a reference
implementation over ``json.loads`` + normalization + SQL three-valued
filter semantics produces. This is the soundness property the DataSource
relies on (skips may only drop rows Catalyst would drop anyway)."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    IsNotNull,
    IsNull,
    LessThanOrEqual,
    StringStartsWith,
)

from tectonic_spark.core.json_parser import JsonParser, Mode
from tectonic_spark.core.result import Failure
from tectonic_spark.sources.pushdown import PushdownPlate, compile_filters
from tectonic_spark.sources.schema_infer import infer_spark_schema, normalize_row

scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="abcxyz ", max_size=6),
)
value = st.recursive(
    scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from("pqr"), children, max_size=2),
    ),
    max_leaves=4,
)
COLS = ["a", "b", "c", "d"]
row_st = st.dictionaries(st.sampled_from(COLS), value, max_size=4)


def _mk_filter(kind: str, col: str, rhs):
    return {
        "eq": lambda: EqualTo((col,), rhs),
        "gt": lambda: GreaterThan((col,), rhs),
        "le": lambda: LessThanOrEqual((col,), rhs),
        "nn": lambda: IsNotNull((col,)),
        "nu": lambda: IsNull((col,)),
        "sw": lambda: StringStartsWith((col,), "a"),
    }[kind]()


def _sql_eval(norm_val, kind: str, rhs) -> bool:
    """Three-valued SQL filter on the NORMALIZED cell (what Catalyst sees);
    unknown (null operand) means the row is dropped."""
    if kind == "nn":
        return norm_val is not None
    if kind == "nu":
        return norm_val is None
    if norm_val is None:
        return False
    try:
        if kind == "eq":
            return bool(norm_val == rhs)
        if kind == "gt":
            return bool(norm_val > rhs)
        if kind == "le":
            return bool(norm_val <= rhs)
        if kind == "sw":
            return isinstance(norm_val, str) and norm_val.startswith("a")
    except TypeError:
        return False
    return False


@settings(max_examples=120, deadline=None)
@given(
    st.lists(row_st, min_size=0, max_size=8),
    st.sets(st.sampled_from(COLS), min_size=1, max_size=4),
    st.sampled_from(["eq", "gt", "le", "nn", "nu", "sw"]),
    st.sampled_from(COLS),
    st.one_of(st.integers(min_value=-5, max_value=5), st.text(alphabet="ax", max_size=2)),
)
def test_pushdown_soundness(rows, required, fkind, fcol, rhs):
    data = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
    schema = infer_spark_schema(rows) if rows else None
    if schema is None or schema.fieldNames() == ["value"]:
        return  # degenerate scan shape; covered elsewhere
    if fcol not in schema.fieldNames():
        return
    filt = _mk_filter(fkind, fcol, rhs)
    tests = compile_filters([filt], schema)

    plate = PushdownPlate(required=set(required) & set(schema.fieldNames()), tests=tests)
    parser = JsonParser(plate, Mode.VALUE_STREAM)
    res = parser.absorb(data)
    assert not isinstance(res, Failure)
    got = list(res.value)
    fin = parser.finish()
    assert not isinstance(fin, Failure)
    got += fin.value

    # reference: normalize every row, apply the SQL filter on the
    # normalized cell. The plate may KEEP rows the filter would drop
    # (conservative) but must NEVER drop a row the filter keeps.
    kept_ids, dropped_ids = [], []
    for i, r in enumerate(rows):
        norm = normalize_row(r, schema)
        (kept_ids if _sql_eval(norm.get(fcol), fkind, rhs) else dropped_ids).append(i)

    # map surviving parser rows back to source rows by full normalization
    # equality on the required+filter columns
    want_cols = (set(required) | {fcol}) & set(schema.fieldNames())

    def key(r):
        n = normalize_row(r, schema)
        return json.dumps({c: n.get(c) for c in sorted(want_cols)}, sort_keys=True, default=str)

    got_keys = sorted(key(r) for r in got)
    must_keep = sorted(key(rows[i]) for i in kept_ids)
    all_keys = sorted(key(r) for r in rows)

    # soundness: every row the SQL filter keeps is present
    remaining = list(got_keys)
    for k in must_keep:
        assert k in remaining, f"pushdown dropped a row the filter keeps: {k}"
        remaining.remove(k)
    # sanity: nothing fabricated
    pool = list(all_keys)
    for k in got_keys:
        assert k in pool
        pool.remove(k)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(value, min_size=0, max_size=8),
    st.sampled_from(["eq", "gt", "le", "nn", "nu", "sw"]),
    st.one_of(st.integers(min_value=-5, max_value=5), st.text(alphabet="ax", max_size=2)),
)
def test_pushdown_soundness_value_column(rows, fkind, rhs):
    """Top-level scalar rows ARE the 'value' cell (ADVICE r1, high): the
    same soundness property over single-value-column scans — the shape
    that previously over-dropped every scalar row under pushdown."""
    data = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
    schema = infer_spark_schema(rows) if rows else None
    if schema is None or schema.fieldNames() != ["value"]:
        return  # only the value-column scan shape is under test here
    filt = _mk_filter(fkind, "value", rhs)
    tests = compile_filters([filt], schema)

    plate = PushdownPlate(required=None, tests=tests, value_col="value")
    parser = JsonParser(plate, Mode.VALUE_STREAM)
    res = parser.absorb(data)
    assert not isinstance(res, Failure)
    got = list(res.value)
    fin = parser.finish()
    assert not isinstance(fin, Failure)
    got += fin.value

    def key(r):
        return json.dumps(normalize_row(r, schema), sort_keys=True, default=str)

    kept = [
        r
        for r in rows
        if _sql_eval(normalize_row(r, schema)["value"], fkind, rhs)
    ]
    remaining = sorted(key(r) for r in got)
    for k in sorted(key(r) for r in kept):
        assert k in remaining, f"value-column pushdown dropped a kept row: {k}"
        remaining.remove(k)
    pool = sorted(key(r) for r in rows)
    for k in sorted(key(r) for r in got):
        assert k in pool
        pool.remove(k)

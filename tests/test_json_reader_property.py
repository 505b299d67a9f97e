"""Property-based reader equivalence: for random nested NDJSON documents,
the C fast path and the event-parser path of TectonicJsonReader must emit
identical Arrow output (same schema, same cells) — including heterogeneous
rows that exercise normalization fallbacks (float-in-long, containers in
scalar columns, >int64 ints)."""

from __future__ import annotations

import json
import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.sources.json_source import FileSplit, TectonicJsonReader
from tectonic_spark.sources.schema_infer import infer_spark_schema

scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**70), max_value=2**70),  # includes >int64
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="abz ", max_size=5),
)
value = st.recursive(
    scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from("pqr"), children, max_size=2),
    ),
    max_leaves=4,
)
row_st = st.dictionaries(st.sampled_from(["a", "b", "c"]), value, max_size=3)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(row_st, min_size=1, max_size=10),
    st.integers(min_value=4, max_value=200),
    st.booleans(),
)
def test_split_invariance(rows, split_bytes, fast):
    """Byte-range splits partition the rows exactly once for ANY split
    size, on both paths (Hadoop text-split semantics)."""
    from tectonic_spark.sources.json_source import plan_splits

    schema = infer_spark_schema(rows)
    if schema.fieldNames() == ["value"]:
        return
    data = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        f.write(data)
        p = f.name
    try:
        opts = {"path": p, "fastpath": "true" if fast else "false"}
        whole = TectonicJsonReader(schema, opts, "lines")
        base = [
            row
            for b in whole.read(FileSplit(p, 0, len(data), len(data)))
            for row in b.to_pylist()
        ]
        split_rows = []
        for s in plan_splits([p], split_bytes, splittable=True):
            r = TectonicJsonReader(schema, opts, "lines")
            split_rows += [row for b in r.read(s) for row in b.to_pylist()]
        key = lambda r: json.dumps(r, sort_keys=True, default=str)  # noqa: E731
        assert sorted(map(key, split_rows)) == sorted(map(key, base))
        assert len(base) == len(rows)
    finally:
        os.unlink(p)


@settings(max_examples=60, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=8))
def test_fast_path_equals_event_path(rows):
    schema = infer_spark_schema(rows)
    if schema.fieldNames() == ["value"]:
        return  # degenerate all-empty shape
    data = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        f.write(data)
        p = f.name
    try:
        split = FileSplit(p, 0, len(data), len(data))
        out = {}
        for fp in ("true", "false"):
            r = TectonicJsonReader(schema, {"path": p, "fastpath": fp}, "lines")
            out[fp] = [row for b in r.read(split) for row in b.to_pylist()]
        assert out["true"] == out["false"]
        assert len(out["true"]) == len(rows)
    finally:
        os.unlink(p)

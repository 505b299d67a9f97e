"""Arrow-batch replay round-trip (SURVEY.md §2.A C4-C7): the reference
reifies event streams into replayable buffers (ReplayPlate/EventCursor,
property-tested in ReplayPlateSpecs.scala:35-100); the Spark mapping is a
materialized Arrow RecordBatch re-driven into any Plate via
``arrow_batch.drive``. Properties pinned here:

* emit∘rebuild identity — driving a batch into a ValueBuilderPlate
  reconstructs exactly the batch's rows;
* replayability — the same batch drives any number of consumers and
  every drive yields identical output (the mark/rewind/reset contract);
* full-pipeline parity — JSON bytes → event parser → rows → Arrow →
  drive ≡ the normalized rows Spark would serve.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from tectonic_spark.core import ReifiedPlate
from tectonic_spark.core.json_parser import JsonParser, Mode
from tectonic_spark.core.value_builder import ValueBuilderPlate
from tectonic_spark.sources.arrow_batch import drive, rows_to_batches
from tectonic_spark.sources.schema_infer import infer_spark_schema, normalize_row

scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="abz ", max_size=5),
)
value = st.recursive(
    scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from("pqr"), children, max_size=2),
    ),
    max_leaves=6,
)
row_st = st.dictionaries(st.sampled_from(["a", "b", "c"]), value, min_size=1, max_size=3)


def _batches(rows):
    schema = infer_spark_schema(rows)
    normed = [normalize_row(r, schema) for r in rows]
    return list(rows_to_batches(normed, schema, batch_rows=10**6)), normed


@settings(max_examples=60, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=8))
def test_drive_rebuilds_batch_rows(rows):
    batches, _ = _batches(rows)
    for batch in batches:
        rebuilt = drive(batch, ValueBuilderPlate())
        assert rebuilt == batch.to_pylist()


@settings(max_examples=40, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=6))
def test_redrive_into_second_consumer_is_identical(rows):
    (batch,), _ = _batches(rows)
    first = drive(batch, ValueBuilderPlate())
    second = drive(batch, ValueBuilderPlate())  # fresh consumer, same batch
    assert first == second
    # and a different consumer kind sees a well-formed stream: every
    # nest has a matching unnest, one finish per row
    reified = ReifiedPlate()
    drive(batch, reified)
    events = reified.events
    depth = 0
    for ev in events:
        if ev[0] in ("nest_map", "nest_arr", "nest_meta"):
            depth += 1
        elif ev[0] == "unnest":
            depth -= 1
            assert depth >= 0
    assert depth == 0


@settings(max_examples=40, deadline=None)
@given(st.lists(row_st, min_size=1, max_size=6))
def test_parser_to_arrow_to_drive_pipeline(rows):
    data = "\n".join(json.dumps(r) for r in rows).encode()
    p = JsonParser(ValueBuilderPlate(), Mode.VALUE_STREAM)
    parsed = list(p.absorb(data).value)
    parsed += p.finish().value
    assert parsed == rows
    batches, normed = _batches(parsed)
    rebuilt = [r for b in batches for r in drive(b, ValueBuilderPlate())]
    # Arrow round-trips the normalized rows; absent keys surface as None
    # cells (batch semantics, not JSON semantics — documented)
    for got, want in zip(rebuilt, normed, strict=True):
        for k, v in want.items():
            assert got[k] == v


def test_value_column_replay():
    import pyarrow as pa

    batch = pa.RecordBatch.from_pylist(
        [{"value": 5}, {"value": None}, {"value": 7}],
        schema=pa.schema([("value", pa.int64())]),
    )
    assert drive(batch, ValueBuilderPlate(), row_column="value") == [5, None, 7]

"""Normalized rows → Arrow RecordBatches (SURVEY.md §7.4).

The reference reifies the event stream into 4-bit-packed tag buffers
(``ReplayPlate.scala:154-164`` / ``EventCursor.scala:27-38``) so a batch can
be scanned columnar-ly. On Spark the idiomatic columnar batch IS Arrow: the
Python DataSource reader yields ``pyarrow.RecordBatch`` objects and Spark
ingests them zero-copy into its vectorized reader path — no per-row pickling.

Batch sizing mirrors the reference's bounded ReplayPlate growth
(ReplayPlate.scala:166-176): we cut a RecordBatch every ``batch_rows`` rows
so executor memory stays bounded no matter how large the input split is.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pyarrow as pa
from pyspark.sql.pandas.types import to_arrow_schema
from pyspark.sql.types import StructType

# ~15% scan throughput over 8k at typical row widths, still bounded memory
# (32k rows x ~1 KB wide rows ≈ 32 MB per in-flight batch)
DEFAULT_BATCH_ROWS = 32768


def arrow_schema_for(schema: StructType) -> pa.Schema:
    return to_arrow_schema(schema)


def empty_schema_batch(n_rows: int) -> pa.RecordBatch:
    """A zero-column batch that still carries its row count (an all-``{}``
    dataset infers an empty struct schema; ``from_pylist`` would lose N)."""
    return pa.RecordBatch.from_struct_array(
        pa.array([{}] * n_rows, type=pa.struct([]))
    )


def drive(batch: pa.RecordBatch, plate, row_column: str | None = None):
    """Replay a materialized Arrow RecordBatch into any Plate — the
    EventCursor mark/rewind/replay analog (EventCursor.scala:136-236,
    property-tested in ReplayPlateSpecs.scala:35-100): SURVEY §1.4 maps the
    reference's reified event buffers onto Arrow batches, and this is the
    "re-drive the buffer into a second consumer" half of that contract. A
    batch can be driven any number of times into any number of plates; each
    row re-fires the event stream its value implies (nest_map/nest_arr per
    container entry, ``map()``/``arr()`` for empty containers, the lazy
    numeric contract for numbers) and ends with ``finish_row``.

    ``row_column`` replays just that column's values as whole rows (the
    single-'value'-column scan shape). Returns ``plate.finish_batch(True)``.

    Plate signals are honored the way the parsers honor them: SKIP_COLUMN
    suppresses the nested value (its unnest still fires, matching the
    PushdownPlate swallow account), SKIP_ROW abandons the row's remaining
    events (finish_row still fires).
    """
    from tectonic_spark.core.signal import Signal  # noqa: F401 (docs)

    rows = batch.to_pylist()
    if row_column is not None:
        rows = [r[row_column] for r in rows]
    for row in rows:
        _emit_value(row, plate)
        plate.finish_row()
    return plate.finish_batch(True)


def _emit_value(v: Any, plate):
    """Fire the event stream for one value; returns the terminal Signal
    (SKIP_ROW propagates up so callers stop emitting)."""
    from tectonic_spark.core.signal import Signal

    if v is None:
        return plate.nul()
    if v is True:
        return plate.tru()
    if v is False:
        return plate.fls()
    if isinstance(v, int):
        return plate.num(str(v), -1, -1)
    if isinstance(v, float):
        s = repr(v)
        e = s.find("e")
        return plate.num(s, s.find("."), e if e >= 0 else s.find("E"))
    if isinstance(v, str):
        return plate.str(v)
    if isinstance(v, dict):
        if not v:
            return plate.map()
        for k, val in v.items():
            sig = plate.nest_map(k)
            if sig is Signal.SKIP_ROW:
                return sig
            if sig is not Signal.SKIP_COLUMN:
                sig = _emit_value(val, plate)
                if sig is Signal.SKIP_ROW:
                    return sig
            sig = plate.unnest()
            if sig is Signal.SKIP_ROW:
                return sig
        return Signal.CONTINUE
    if isinstance(v, list):
        if not v:
            return plate.arr()
        for val in v:
            sig = plate.nest_arr()
            if sig is Signal.SKIP_ROW:
                return sig
            if sig is not Signal.SKIP_COLUMN:
                sig = _emit_value(val, plate)
                if sig is Signal.SKIP_ROW:
                    return sig
            sig = plate.unnest()
            if sig is Signal.SKIP_ROW:
                return sig
        return Signal.CONTINUE
    raise TypeError(
        f"cannot replay value of type {type(v).__name__} "
        "(only JSON-representable batch values re-drive)"
    )


def rows_to_batches(
    rows: Iterable[dict[str, Any]],
    schema: StructType,
    batch_rows: int = DEFAULT_BATCH_ROWS,
) -> Iterator[pa.RecordBatch]:
    """Chunk normalized dict-rows into Arrow RecordBatches of ``batch_rows``."""
    arrow_schema = arrow_schema_for(schema)
    zero_col = len(arrow_schema) == 0
    buf: list[dict[str, Any]] = []
    for row in rows:
        buf.append(row)
        if len(buf) >= batch_rows:
            yield (
                empty_schema_batch(len(buf))
                if zero_col
                else pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
            )
            buf = []
    if buf:
        yield (
            empty_schema_batch(len(buf))
            if zero_col
            else pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
        )

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

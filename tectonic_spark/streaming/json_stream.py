"""Streaming flavor of the tectonic sources (SURVEY.md §7.8).

The reference's fs2 layer turns the incremental parser into
``Stream[F, Byte] → Pipe → Stream[F, B]`` (fs2/StreamParser.scala:29-82);
the Spark-idiomatic equivalent is a micro-batch file source:

* **Offsets** are directory snapshots ``{"files": {path: size}}`` — files
  are assumed immutable once visible (the standard Spark file-source
  contract). An offset range's work is exactly the newly-appeared files.
* **partitions(start, end)** plans the same byte-range :class:`FileSplit`
  units as the batch reader, so a micro-batch containing a huge file still
  fans out across executors — parsing never serializes onto the driver.
* **read(partition)** runs on executors and reuses the batch reader's
  block parser (projection pushdown included via the scan schema), emitting
  tuples in schema order.

One generic reader serves both formats: the JSON and CSV DataSources pass
their batch reader (which owns format config and the ``read(FileSplit)``
loop) plus a splittability flag.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSourceStreamReader
from pyspark.sql.types import StructType

from tectonic_spark.sources.json_source import (
    _DEFAULT_SPLIT,
    FileSplit,
    list_input_files,
    plan_splits,
)


class TectonicFileStreamReader(DataSourceStreamReader):
    """Micro-batch tail of a directory through any tectonic batch reader."""

    def __init__(self, batch_reader, schema: StructType, options: dict, splittable: bool) -> None:
        self._batch_reader = batch_reader
        self.options = options
        self.splittable = splittable
        self._names = schema.fieldNames()
        # maxFilesPerTrigger: rate-limit each micro-batch to N new files
        # (Spark file-source parity). latestOffset advances by at most N
        # files per call, so a directory of M files drains over ⌈M/N⌉
        # micro-batches — offset continuation exercised for real, not just
        # one availableNow snapshot.
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else None
        # monotonic high-water mark of files already surfaced in an offset.
        # Driver-side state: after a restart it resets and the first
        # latestOffset may trail the committed offset — partitions() then
        # sees no new files and later calls catch up monotonically, so
        # replay stays exactly-once.
        self._known: dict[str, int] = {}

    # ---------------------------------------------------------------- offsets

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"files": {}}

    def latestOffset(self) -> dict:  # noqa: N802 (Spark API name)
        try:
            files = list_input_files(self.options["path"])
        except FileNotFoundError:
            files = []
        sizes = {f: os.path.getsize(f) for f in files}
        if self.max_files is None:
            return {"files": sizes}
        new = sorted(f for f in sizes if f not in self._known)[: self.max_files]
        snap = dict(self._known)
        snap.update({f: sizes[f] for f in new})
        self._known = snap
        return {"files": dict(snap)}

    def partitions(self, start: dict, end: dict) -> list[FileSplit]:
        seen = set(start.get("files", {}))
        end_files = end.get("files", {})
        new_files = [f for f in sorted(end_files) if f not in seen]
        split_bytes = int(self.options.get("splitsizebytes", _DEFAULT_SPLIT))
        # plan from the sizes snapshotted in the END offset, not the live
        # filesystem: replaying a committed micro-batch after failure must
        # read the exact same byte ranges even if a file grew since
        splits = plan_splits(
            new_files,
            split_bytes,
            splittable=self.splittable,
            sizes={f: end_files[f] for f in new_files},
        )
        # Spark requires ≥1 partition per micro-batch; use an empty marker
        return splits or [FileSplit("", 0, 0, 0)]

    # ------------------------------------------------------------------ read

    def read(self, partition: FileSplit) -> Iterator[tuple]:
        if not partition.file:
            return
        for batch in self._batch_reader.read(partition):
            for row in batch.to_pylist():
                yield tuple(row[n] for n in self._names)

    def commit(self, end: dict) -> None:
        return None


def TectonicJsonStreamReader(schema: StructType, options: dict, mode: str) -> TectonicFileStreamReader:
    from tectonic_spark.sources.json_source import TectonicJsonReader

    return TectonicFileStreamReader(
        TectonicJsonReader(schema, options, mode),
        schema,
        options,
        splittable=(mode == "lines"),
    )

"""Writer half of the tectonic DataSources (``df.write.format("tectonic-json"
| "tectonic-csv")``) — the engine's own sink surface.

The reference has no sinks (SURVEY.md §2.A); round 1 used Spark's built-in
writers as the sink story. These writers complete the switch story — a user
of the engine reads AND writes both formats through the same registered
source names, with the CSV config surface (sep/quote/escape/lineSep/header)
shared with the reader.

Commit protocol (Arrow-batched, ``DataSourceArrowWriter``): each task
writes one uniquely-named part file directly into the target directory and
reports it in its commit message; ``commit`` keeps exactly the reported
files (removing orphans from failed/speculative attempts) and drops a
``_SUCCESS`` marker; ``abort`` deletes whatever completed tasks wrote.
Unique names make concurrent attempts safe on any shared filesystem —
the same protocol shape as Hadoop's v2 file committer.

Nulls: JSON writes ``null`` cells faithfully; CSV writes the empty string
(Spark's own CSV writer default — the reader's all-strings model cannot
distinguish them either, csv/Parser.scala model per README.md:89).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import DataSourceArrowWriter, WriterCommitMessage


@dataclass
class FileCommit(WriterCommitMessage):
    path: str
    rows: int


def _clear_parts(path: str) -> None:
    for f in os.listdir(path):
        if f.startswith("part-") or f == "_SUCCESS":
            os.unlink(os.path.join(path, f))


def _iso_timestamp(v) -> str:
    """Spark writer default rendering (`yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]`):
    tz-aware values normalize to UTC with millis + 'Z'; TIMESTAMP_NTZ
    (naive) values render without an offset."""
    import datetime

    if v.tzinfo is not None:
        v = v.astimezone(datetime.timezone.utc)
        return v.strftime("%Y-%m-%dT%H:%M:%S") + f".{v.microsecond // 1000:03d}Z"
    return v.isoformat(sep="T")


def _json_default(v: Any):
    """JSON encoding for Arrow-surfaced non-JSON scalars (timestamps,
    dates) — ISO-8601 'T' text, matching Spark's JSON writer defaults.
    Decimals are handled before dumps (see :func:`_encode_json_row`) so
    they stay exact numbers rather than lossy floats."""
    import datetime

    if isinstance(v, datetime.datetime):
        return _iso_timestamp(v)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(v)).decode()
    raise TypeError(f"not JSON serializable: {type(v).__name__}")


def _encode_json_row(row: Any) -> str:
    """``json.dumps`` with Decimals inlined as their exact decimal text
    (Spark's JSON writer emits decimal columns as exact numbers; a float
    round-trip silently loses >15-significant-digit values). Decimals are
    swapped for unique placeholder strings pre-dump and the quoted
    placeholders replaced with raw number text post-dump."""
    import decimal
    import json as _json

    decimals: list[str] = []
    token = f"\x7fdec{uuid.uuid4().hex}:"

    def swap(v: Any) -> Any:
        if isinstance(v, decimal.Decimal):
            decimals.append(format(v, "f"))
            return f"{token}{len(decimals) - 1}"
        if isinstance(v, dict):
            return {k: swap(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [swap(x) for x in v]
        return v

    text = _json.dumps(swap(row), ensure_ascii=False, default=_json_default)
    for i, d in enumerate(decimals):
        text = text.replace(f'"{token}{i}"', d)
    return text


class _PartFileWriter(DataSourceArrowWriter):
    """Shared task/commit plumbing; subclasses provide ``_write_part``."""

    suffix = ".txt"

    _COMP_EXT = {"none": "", "gzip": ".gz", "bz2": ".bz2", "xz": ".xz"}

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.options = options
        self.path = options["path"]
        self.compression = str(options.get("compression", "none")).lower()
        if self.compression not in self._COMP_EXT:
            raise ValueError(
                f"unsupported compression {self.compression!r} "
                f"(one of {sorted(self._COMP_EXT)})"
            )
        # driver-side construction: prepare the directory and mint a job id
        # (shared by all tasks via pickling) so commit's orphan sweep only
        # touches THIS job's attempts — append must not disturb prior parts
        self.job_id = uuid.uuid4().hex[:12]
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            _clear_parts(self.path)

    def write(self, iterator) -> FileCommit:
        part = os.path.join(
            self.path,
            f"part-{self.job_id}-{uuid.uuid4().hex}{self.suffix}"
            + self._COMP_EXT[self.compression],
        )
        rows = self._write_part(part, iterator)
        if rows == 0:
            # no part file for an empty partition (Spark writer behavior;
            # header-only CSV parts would also poison header inference)
            if os.path.exists(part):
                os.unlink(part)
            return FileCommit(path="", rows=0)
        return FileCommit(path=part, rows=rows)

    def _write_part(self, part: str, iterator) -> int:
        raise NotImplementedError

    def _open_text(self, part: str, newline: str | None = None):
        """Text handle honoring the ``compression`` option — parts write
        compressed in the task, mirroring the sources' open_input."""
        kw = dict(encoding="utf-8", newline=newline)
        if self.compression == "gzip":
            import gzip

            return gzip.open(part, "wt", **kw)
        if self.compression == "bz2":
            import bz2

            return bz2.open(part, "wt", **kw)
        if self.compression == "xz":
            import lzma

            return lzma.open(part, "wt", **kw)
        return open(part, "w", **kw)

    def commit(self, messages) -> None:
        keep = {
            os.path.basename(m.path) for m in messages if m is not None and m.path
        }
        mine = f"part-{self.job_id}-"
        for f in os.listdir(self.path):
            if f.startswith(mine) and f not in keep:
                os.unlink(os.path.join(self.path, f))  # orphaned attempts
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and m.path and os.path.exists(m.path):
                os.unlink(m.path)


class TectonicJsonWriter(_PartFileWriter):
    """NDJSON part files (the reader's ``lines`` framing)."""

    suffix = ".json"

    def _write_part(self, part: str, iterator) -> int:
        n = 0
        with self._open_text(part) as fh:
            for batch in iterator:
                for row in batch.to_pylist():
                    fh.write(_encode_json_row(row))
                    fh.write("\n")
                    n += 1
        return n


class TectonicCsvWriter(_PartFileWriter):
    """CSV part files under the reader's config surface (sep/quote/escape/
    lineSep/header); every part file carries its own header row, like
    Spark's CSV writer."""

    suffix = ".csv"

    def __init__(self, options: dict, overwrite: bool, columns: list[str]) -> None:
        super().__init__(options, overwrite)
        self.columns = columns
        self.sep = options.get("sep", ",")
        self.quote = options.get("quote", '"')
        self.escape = options.get("escape", '"')
        self.line_sep = options.get("linesep", "\r\n")
        self.header = str(options.get("header", "true")).lower() != "false"

    def _write_part(self, part: str, iterator) -> int:
        import csv as _csv

        n = 0
        with self._open_text(part, newline="") as fh:
            w = _csv.writer(
                fh,
                delimiter=self.sep,
                quotechar=self.quote,
                doublequote=(self.escape == self.quote),
                escapechar=None if self.escape == self.quote else self.escape,
                lineterminator=self.line_sep,
                quoting=_csv.QUOTE_MINIMAL,
            )
            if self.header:
                w.writerow(self.columns)
            for batch in iterator:
                for row in batch.to_pylist():
                    w.writerow([_csv_cell(row[c]) for c in self.columns])
                    n += 1
        return n


def _csv_cell(v: Any) -> str:
    """Scalar → CSV text matching Spark's CSV writer conventions:
    lowercase booleans, ISO-8601 'T' timestamps, exact decimal text —
    not Python ``str()`` (which yields 'True'/'False' and repr formats)."""
    import datetime
    import decimal

    if v is None:
        return ""
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, datetime.datetime):
        return _iso_timestamp(v)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return format(v, "f")
    return v if isinstance(v, str) else str(v)

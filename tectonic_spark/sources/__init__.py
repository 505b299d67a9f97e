"""Spark-facing source layer (SURVEY.md §7.4-7.6).

* :mod:`schema_infer` — dynamic-JSON schema inference + row normalization
  (the batch layer's typing pass; replaces the reference's "consumer decides
  the types" with a Spark StructType chosen once per read).
* :mod:`arrow_batch` — normalized rows → Arrow RecordBatches (the idiomatic
  replacement for the reference's 4-bit-packed EventCursor buffers).
* :mod:`json_source` / :mod:`csv_source` — Python DataSourceV2
  (``spark.read.format("tectonic-json" | "tectonic-csv")``) wiring Catalyst
  filter pushdown to the L1 parsers' SKIP_ROW / SKIP_COLUMN byte skips.
"""

from tectonic_spark.sources.arrow_batch import rows_to_batches
from tectonic_spark.sources.csv_source import TectonicCsvDataSource
from tectonic_spark.sources.json_source import TectonicJsonDataSource
from tectonic_spark.sources.schema_infer import infer_spark_schema, normalize_row
from tectonic_spark.sources.registration import register_tectonic_sources

__all__ = [
    "TectonicCsvDataSource",
    "TectonicJsonDataSource",
    "infer_spark_schema",
    "normalize_row",
    "register_tectonic_sources",
    "rows_to_batches",
]

"""tectonic_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of precog/tectonic (columnar JSON/CSV parsing
with Mison-style pushdown), the relational surface delegated to Spark
SQL/Catalyst, plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layering (see SURVEY.md §7):
  L1  ``tectonic_spark.core``       — pure-Python columnar parser core
                                      (no Spark imports)
  L2  ``tectonic_spark.sources``    — Spark Python DataSource binding
                                      (projection/filter pushdown → L1 skips)
  L3  ``tectonic_spark.operators``  — Spark-delegated relational surface +
                                      LLM-pipeline extensions
      ``tectonic_spark.streaming``  — Structured Streaming operators
"""

from tectonic_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]

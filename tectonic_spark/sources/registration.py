"""Register the tectonic DataSources on a SparkSession.

Filter pushdown into Python data sources is gated by
``spark.sql.python.filterPushdown.enabled`` — that conf is static per
session, so :func:`tectonic_spark.get_spark` sets it at build time; this
helper just registers the formats.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_tectonic_sources(spark: SparkSession) -> SparkSession:
    from tectonic_spark.sources.csv_source import TectonicCsvDataSource
    from tectonic_spark.sources.json_source import TectonicJsonDataSource

    spark.dataSource.register(TectonicJsonDataSource)
    spark.dataSource.register(TectonicCsvDataSource)
    return spark

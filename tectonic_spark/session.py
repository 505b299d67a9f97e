"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same
configuration is what we would set cluster-side, minus ``master``:

* AQE on (runtime re-planning, skew-join handling, partition coalescing).
* ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  1000-executor cluster this would be 2-3x total cores (AQE coalesces down).
* Arrow enabled so Pandas-UDF exchange is vectorized, not pickled rows.
* UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tectonic-spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession used by tests, bench, and the driver.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (falls back to ``*``).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_shuffle = os.environ.get("TECTONIC_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n_shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("TECTONIC_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let Catalyst hand filters to our Python DataSources (static conf;
        # TECTONIC_FILTER_PUSHDOWN=false replicates sessions built without
        # it — e.g. the correctness driver's — for local gate runs)
        .config(
            "spark.sql.python.filterPushdown.enabled",
            os.environ.get("TECTONIC_FILTER_PUSHDOWN", "true"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Loaders for the driver-generated TESTDATA parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. All reads go through ``spark.read.parquet`` so
Catalyst gets native predicate pushdown / column pruning on the scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (they grow
# sub-linearly or are fixed-size in TPC-H-style data).
BROADCASTABLE = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one TESTDATA table as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as long (nanosAsLong) and convert
    to a micros timestamp with integer division (the data has no
    sub-microsecond components, and double division would lose precision at
    ~1e18 nanos).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def spread_small_scan(
    df: DataFrame, spark: SparkSession, *key: str, frac: float = 1.0
) -> DataFrame:
    """Repartition a scan ONLY when it arrives in fewer splits than cores.

    CPU-heavy kernels (shingling, PQ encoding) downstream of a tiny file
    scan would serialize onto the scan's one-or-two input splits; spreading
    by key fixes that locally. But at 100 TB the scan already yields
    thousands of splits, and an unconditional ``repartition`` there is a
    full shuffle of the raw corpus for nothing (VERDICT r5 item 2). The
    split count comes from the file listing — no job is executed.

    ``frac`` tightens the trigger for CHEAP downstream work (r13): a plain
    aggregation only gains from the extra shuffle when the scan is truly
    serial (a single-row-group file), not when it is merely a little under
    core count — measured on b05 at sf1, spreading a 27-split scan to 32
    cost more than it saved (1.43s -> 1.62s) while at sf0.1 the 1-effective-
    split scan gained 25% (1.45s -> 1.1s). CPU-heavy callers keep the
    default trigger (any deficit vs cores is worth fixing there).
    """
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1.0, parallelism * frac):
        return df
    return df.repartition(parallelism, *key)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

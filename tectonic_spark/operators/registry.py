"""Central registry of declared queries (SURVEY.md §2.B).

Every operator the engine claims is registered here as a ``Query``:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (when expressible)
an equivalent DuckDB SQL string the driver uses as correctness oracle
(row-count + schema + order-insensitive value-hash).

Cross-engine determinism rules every registered query follows:

* **Double aggregation goes through DECIMAL.** ``SUM(double)`` is
  order-dependent; Spark and DuckDB will sum in different orders and the
  value-hash would flip on the last ulp. We cast the per-row expression to
  ``DECIMAL(27,6)`` (exact, associative sum) and cast the result back to
  ``DOUBLE``. Per-row double arithmetic itself is IEEE-deterministic and
  identical across engines.
* **Every ORDER BY / window ORDER BY carries a unique tie-break key.**
* **Counts are BIGINT on both sides** (Spark ``count`` is LongType,
  DuckDB ``count(*)`` is BIGINT); INT-returning functions (``year``,
  ``row_number``) are cast to BIGINT explicitly where engines differ.
* **Aliases match exactly** between the Spark builder and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Decorator: add a query builder to the global registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


# ---------------------------------------------------------------------------
# shared deterministic-aggregation helpers


def dsum(col: Column, alias: str) -> Column:
    """Order-insensitive exact sum of a double expression → double."""
    return F.sum(col.cast("decimal(27,6)")).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """avg = exact decimal sum / count, division done once in double."""
    return (
        F.sum(col.cast("decimal(27,6)")).cast("double") / F.count(col)
    ).alias(alias)


def o_dsum(expr: str) -> str:
    """DuckDB-side counterpart of :func:`dsum` (alias added by caller)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def o_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr})"

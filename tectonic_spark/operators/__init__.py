"""Operator surface (SURVEY.md §2.B) — importing this package registers
every declared query into :mod:`tectonic_spark.operators.registry`."""

from tectonic_spark.operators import (  # noqa: F401
    clustering,
    dedup,
    graph,
    multimodal,
    parser_ops,
    pipeline,
    relational,
    similarity,
    skew,
    text,
)
from tectonic_spark.operators.registry import (
    REGISTRY,
    Query,
    finalize_order,
    queries,
    oracle_sql,
)

finalize_order()

__all__ = ["REGISTRY", "Query", "queries", "oracle_sql"]

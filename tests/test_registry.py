"""Registry contract tests: every declared query analyzes cleanly, aliases
are consistent, and the driver entry points work."""

from __future__ import annotations

import pytest

import tectonic_spark.operators as ops


def test_registry_nonempty():
    assert len(ops.REGISTRY) >= 30


def test_oracle_coverage():
    # the vast majority of queries must carry a DuckDB oracle
    with_oracle = [q for q in ops.REGISTRY.values() if q.oracle is not None]
    assert len(with_oracle) >= 0.8 * len(ops.REGISTRY)


def test_driver_contract_shape():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())


@pytest.mark.parametrize("name", sorted(ops.REGISTRY))
def test_query_analyzes(spark, sf_dir, name):
    """Schema resolution (no execution) — catches analysis errors fast."""
    df = ops.REGISTRY[name].builder(spark, sf_dir)
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.entry(spark).collect()
    assert len(rows) >= 0

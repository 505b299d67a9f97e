"""Plan inspection helpers — the feedback loop for scale tuning.

``explain_str(df, "formatted")`` returns what ``df.explain("formatted")``
prints, so tests can assert that filters reached the parquet scan
(PushedFilters), columns were pruned (ReadSchema), joins broadcast, and the
hot path stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture the explain output of a DataFrame as a string."""
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def physical_plan(df: DataFrame) -> str:
    """The executed (physical) plan tree as a string."""
    return df._jdf.queryExecution().executedPlan().toString()

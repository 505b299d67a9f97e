"""Skew mitigation: salted joins (SURVEY.md 'Optimize for scale' — skewed
keys → salting or AQE skew-join).

AQE's skew-join split (on by default in :func:`tectonic_spark.get_spark`)
handles most runtime skew; explicit salting remains the tool when one key's
rows exceed a single executor's memory even after splitting, or when the
skew is known ahead of plan time. The pattern: the big side gains a random
salt in [0, n); the small side is replicated n times, once per salt value;
the join key becomes (key, salt) so one hot key fans out over n tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tectonic_spark.operators.registry import register
from tectonic_spark.tables import table

_SALT = "_tect_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Column,
    n_salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` with the big side salted n ways.

    ``on`` is the ordinary equi-join condition (built from the two frames'
    columns). Row multiplicity is unchanged: each big row carries ONE salt
    value and matches exactly one of the small side's n replicas, so the
    result equals the unsalted join — verified by the b03_join_salted
    oracle. Cost: small side inflates n×; worth it when a hot key would
    otherwise pin one task.

    Only ``inner`` and ``left`` are multiplicity-preserving: with
    right/full, an unmatched small-side row would surface once per salt
    replica (n duplicates), so those modes are rejected.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "unmatched small-side rows would appear once per salt replica"
        )
    big_s = big.withColumn(_SALT, F.floor(F.rand(seed) * n_salt).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    cond = on & (big_s[_SALT] == small_s[_SALT])
    return big_s.join(small_s, cond, how).drop(_SALT)


@register(
    "b03_join_salted",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    """,
    doc="Salted equi-join (16-way) — result must equal the plain join; the "
    "salt spreads any hot customer key over 16 tasks at the cost of a 16x "
    "replicated build side.",
)
def b03_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return salted_join(o, c, on=o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name"
    )

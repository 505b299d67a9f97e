"""Relational operator surface (SURVEY.md §2.B b1-b13), delegated to
Spark SQL / Catalyst.

The reference (precog/tectonic) implements no relational operators — they
live downstream in the Precog stack (SURVEY.md §2.A "Categories with NO
implementation"). Our engine's idiomatic equivalent of "the Plate consumer
decides what to compute" is to declare logical plans with the DataFrame API
and let Catalyst/Tungsten pick physical strategies (broadcast vs SMJ,
whole-stage codegen, AQE).

Scale notes (100 TB design intent, reviewed per query):
* fact-fact joins shuffle on join keys; dimension joins are broadcast
  (``F.broadcast``) so no shuffle of the fact side is needed;
* aggregations are partial (map-side combine) automatically for all
  ``groupBy().agg()`` forms used here;
* every scan is parquet → Catalyst pushes filters + prunes columns at the
  source (verified in tests via ``explain``);
* windows partition by bounded-cardinality keys (nation, custkey), never a
  single global partition, except explicitly-global top-k which Spark
  executes as TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tectonic_spark.operators.registry import davg, dsum, o_davg, o_dsum, register
from tectonic_spark.tables import table


# ---------------------------------------------------------------------------
# b1 projection / computed columns


@register(
    "b01_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS rev,
           CAST(l_quantity >= 25 AS BOOLEAN) AS bulk
    FROM lineitem
    """,
    doc="Projection + computed columns; parquet scan must prune to 5 columns.",
)
def b01_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        (F.col("l_quantity") >= 25).alias("bulk"),
    )


# b2 filter / predicates


@register(
    "b02_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Conjunctive predicates; all three land in parquet PushedFilters.",
)
def b02_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


# b3 equi-joins: inner / semi / anti


@register(
    "b03_join_star",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, n.n_name, r.r_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
    doc="Star join: fact → broadcast dims (customer/nation/region). At 100 TB "
    "orders is the only shuffled side; nation/region broadcast at any SF.",
)
def b03_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "o_totalprice", "c_name", "n_name", "r_name")
    )


@register(
    "b03_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    doc="LEFT SEMI join (EXISTS).",
)
def b03_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "b03_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT ANTI join (NOT EXISTS).",
)
def b03_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "b03_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    """,
    doc="LEFT OUTER join with join-side predicate (kept in the ON clause).",
)
def b03_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 300000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


# b4 theta / range join


@register(
    "b04_range_join",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sum_qty} AS sum_qty
    FROM lineitem l
    JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_extendedprice BETWEEN p.p_retailprice * 0.5 AND p.p_retailprice * 20.0
    GROUP BY p.p_brand
    """.format(sum_qty=o_dsum("l.l_quantity")),
    doc="Equi + range (theta) join. The equi key keeps it hash-joinable at "
    "scale; the BETWEEN is a post-join residual — never a cartesian product.",
)
def b04_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (l.l_partkey == p.p_partkey)
        & (l.l_extendedprice >= p.p_retailprice * 0.5)
        & (l.l_extendedprice <= p.p_retailprice * 20.0)
    )
    return (
        l.join(F.broadcast(p), cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_quantity"), "sum_qty"),
        )
    )


# b5 hash aggregation + distinct


@register(
    "b05_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty} AS sum_qty,
           {sum_base} AS sum_base_price,
           {sum_disc} AS sum_disc_price,
           {sum_charge} AS sum_charge,
           {avg_qty} AS avg_qty,
           {avg_price} AS avg_price,
           {avg_disc} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=o_dsum("l_quantity"),
        sum_base=o_dsum("l_extendedprice"),
        sum_disc=o_dsum("l_extendedprice * (1 - l_discount)"),
        sum_charge=o_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"),
        avg_qty=o_davg("l_quantity"),
        avg_price=o_davg("l_extendedprice"),
        avg_disc=o_davg("l_discount"),
    ),
    doc="TPC-H Q1-style pricing summary (flagship). Partial aggregation "
    "(map-side combine) on 6 grouping cells; scan prunes to 7 columns.",
)
def b05_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tectonic_spark.tables import spread_small_scan

    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    # r13: the sf0.1 lineitem file is ONE parquet row group, so the scan +
    # the decimal-heavy partial aggregation serialize onto a single core.
    # Spread only when the scan is truly serial (< cores/2 splits): no-op
    # at sf1 (27 splits) and at scale — see tables.spread_small_scan.
    l = spread_small_scan(l, spark, frac=0.5)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg(F.col("l_quantity"), "avg_qty"),
        davg(F.col("l_extendedprice"), "avg_price"),
        davg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "b05_distinct_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           {avg_total} AS avg_total
    FROM orders GROUP BY o_orderpriority
    """.format(avg_total=o_davg("o_totalprice")),
    doc="COUNT DISTINCT inside grouped agg (Spark expands to two-phase plan).",
)
def b05_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # r14: spread_small_scan(frac=0.5) A/B'd and REVERTED (interleaved at
    # sf0.1: plain 0.465 s vs spread 0.708 s best-of-4) — the distinct
    # expansion's partial phase collapses rows in the scan stage, so the
    # repartition re-shuffles raw rows for nothing (same result as the
    # r13 b05_approx_distinct A/B).
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        davg(F.col("o_totalprice"), "avg_total"),
    )


@register(
    "b05_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS err_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for distinct "
    "counts — no exact-distinct shuffle explosion. The sketch value is "
    "engine-specific, so the oracle-checked contract is the rsd bound: "
    "err_ok := |approx - exact| / exact <= 0.05 (rsd=0.02, so 0.05 ≈ 2.5σ). "
    "Production callers use the approx aggregate alone; the exact "
    "countDistinct here exists to make the bound a hash-checkable assertion "
    "rather than a rows-only row (VERDICT r3 item 5).",
)
def b05_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts")
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n_rows",
        (err <= F.lit(0.05)).alias("err_ok"),
    )


# b6 rollup / cube / grouping sets


@register(
    "b06_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sum_qty} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """.format(sum_qty=o_dsum("l_quantity")),
    doc="ROLLUP grouping sets (subtotals + grand total).",
)
def b06_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity"), "sum_qty"),
    )


@register(
    "b06_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sum_total} AS sum_total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """.format(sum_total=o_dsum("o_totalprice")),
    doc="CUBE grouping sets.",
)
def b06_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "sum_total"),
    )


# b7 window functions


@register(
    "b07_topn_per_group",
    oracle="""
    WITH rev AS (
      SELECT n.n_name, c.c_custkey,
             {rev} AS revenue
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY n.n_name, c.c_custkey
    )
    SELECT n_name, c_custkey, revenue, rn FROM (
      SELECT n_name, c_custkey, revenue,
             CAST(ROW_NUMBER() OVER (PARTITION BY n_name
                   ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rn
      FROM rev) t
    WHERE rn <= 3
    """.format(rev=o_dsum("o.o_totalprice")),
    doc="Top-3 customers by revenue per nation: ROW_NUMBER over bounded "
    "partitions (25 nations). Revenue summed exactly (decimal) so the "
    "window order is cross-engine deterministic; c_custkey tie-break.",
)
def b07_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    # orders is the fact side: pin SMJ so it is never broadcast-built on
    # the driver (r13, guide §3.1 — see q05)
    o = table(spark, sf_dir, "orders").hint("merge")
    rev = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy("n_name", "c_custkey")
        .agg(dsum(F.col("o_totalprice"), "revenue"))
    )
    w = W.partitionBy("n_name").orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_custkey", "revenue", "rn")
    )


@register(
    "b07_running_window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_total
    FROM orders
    """,
    doc="Running sum + LAG per customer, unique (o_orderdate, o_orderkey) "
    "ordering; running sum through decimal for exactness.",
)
def b07_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_total"),
    )


@register(
    "b07_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS BIGINT) AS size_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS BIGINT) AS price_quartile
    FROM part
    """,
    doc="RANK / DENSE_RANK / NTILE windows per brand.",
)
def b07_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    by_price_desc = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    by_size = W.partitionBy("p_brand").orderBy("p_size")
    by_price = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(by_price_desc).cast("long").alias("price_rank"),
        F.dense_rank().over(by_size).cast("long").alias("size_dense_rank"),
        F.ntile(4).over(by_price).cast("long").alias("price_quartile"),
    )


# b8 sort / limit / top-k


@register(
    "b08_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k: Spark executes TakeOrderedAndProject (per-partition "
    "heap + driver merge), never a full sort — the right plan at 100 TB.",
)
def b08_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


# b9 set operations


@register(
    "b09_setops",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big_spenders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                          WHERE o_totalprice > 250000)
    SELECT 'intersect' AS op, c_custkey
      FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big_spenders)
    UNION ALL
    SELECT 'except' AS op, c_custkey
      FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big_spenders)
    """,
    doc="INTERSECT / EXCEPT / UNION ALL over customer-key sets.",
)
def b09_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        o.filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    inter = building.intersect(big).select(F.lit("intersect").alias("op"), "c_custkey")
    exc = building.subtract(big).select(F.lit("except").alias("op"), "c_custkey")
    return inter.unionAll(exc)


# b10 scalar function library


@register(
    "b10_scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           string_split(p_type, ' ')[1] AS type_head,
           abs(p_retailprice - 1000.0) AS price_dev,
           round(p_retailprice * 1.1, 2) AS price_bump,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           CAST(p_partkey % 7 AS BIGINT) AS key_mod,
           CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'mid'
                ELSE 'small' END AS size_class
    FROM part
    """,
    doc="String/math/conditional scalar functions — all JVM-side built-ins, "
    "whole-stage-codegen'd; no Python in the hot path.",
)
def b10_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_bump"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        (F.col("p_partkey") % 7).cast("long").alias("key_mod"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "mid")
        .otherwise("small")
        .alias("size_class"),
    )


@register(
    "b10_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           date_trunc('month', o_orderdate) AS order_month_start
    FROM orders
    """,
    doc="Datetime extraction + interval arithmetic (UTC session timezone).",
)
def b10_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
    )


@register(
    "b10_array_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           string_split(event_type, 'e')[1] AS type_head,
           CAST(length(string_split(event_type, 'e')) AS INTEGER) AS type_parts,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL
                THEN 'absent' ELSE 'present' END AS missing_probe
    FROM events
    """,
    doc="Semi-structured access: JSON path extraction on the events.props "
    "string column (get_json_object ≈ json_extract_string) + array ops.",
)
def b10_array_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    parts = F.split(F.col("event_type"), "e")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        parts.getItem(0).alias("type_head"),
        F.size(parts).alias("type_parts"),
        F.when(F.get_json_object("props", "$.missing").isNull(), "absent")
        .otherwise("present")
        .alias("missing_probe"),
    )


# b11 time-window aggregation (batch-checkable flavor; streaming variant in
# tectonic_spark.streaming)


@register(
    "b11_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sum_value} AS sum_value
    FROM events
    GROUP BY 1, 2
    """.format(sum_value=o_dsum("value")),
    doc="Tumbling 1-hour windows over events (epoch-aligned, = streaming "
    "window() semantics on static data).",
)
def b11_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@register(
    "b11_session_window",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      -- Spark session windows are [start, last+gap): an event exactly at
      -- prev+gap starts a NEW session, hence >= not >.
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM lagged),
    sessions AS (
      -- event_id tie-break: duplicate timestamps are real at scale (sf1
      -- replicates every ts 10x) and an order-underdetermined cumulative
      -- sum lets tied rows land before the flagged session opener,
      -- splitting sessions arbitrarily (caught by the sf1 sweep).
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Session windows (30 min gap) per user — Spark session_window vs a "
    "gaps-and-islands SQL oracle. Streaming flavor lives in streaming/.",
)
def b11_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
        .select("user_id", "session_start", "n_events")
    )


# b12 dedup


@register(
    "b12_dedup_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="Exact distinct on projected keys (dropDuplicates ≡ DISTINCT).",
)
def b12_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates()


@register(
    "b12_dedup_earliest",
    oracle="""
    SELECT user_id, event_type, MIN(ts) AS first_ts,
           CAST(COUNT(*) AS BIGINT) AS n_dupes
    FROM events GROUP BY user_id, event_type
    """,
    doc="Keep-earliest dedup, expressed as deterministic MIN/COUNT agg (the "
    "order-dependent dropDuplicates() keep-first is not cross-engine stable).",
)
def b12_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.count(F.lit(1)).alias("n_dupes"),
    )


# b13 UDF / UDAF surface (Arrow-vectorized pandas UDFs — the sanctioned slow path)


@register(
    "b13_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge
    FROM lineitem
    """,
    doc="Scalar pandas UDF (Arrow-batched, vectorized) computing the same "
    "expression as the SQL oracle — identical IEEE double results. "
    "Demonstrates the UDF surface; real queries keep this JVM-side.",
)
def b13_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def charge_udf(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1 - discount)) * (1 + tax)

    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        charge_udf("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "b13_grouped_map_udf",
    oracle="""
    SELECT l_returnflag,
           {avg_price} AS mean_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """.format(avg_price=o_davg("l_extendedprice")),
    doc="applyInPandas grouped-map UDAF: per-group pandas computation with "
    "exact decimal mean (matches the SQL oracle bit-for-bit).",
)
def b13_grouped_map_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import Decimal

    schema = T.StructType(
        [
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("mean_price", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact decimal sum → double, same contract as registry.davg
        total = sum(
            (Decimal(repr(v)).quantize(Decimal("0.000001")) for v in pdf["l_extendedprice"]),
            Decimal(0),
        )
        n = len(pdf)
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "mean_price": [float(total) / n],
                "n": [n],
            }
        )

    l = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return l.groupBy("l_returnflag").applyInPandas(per_group, schema)


# Multi-join analytical queries (bench headliners)


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           {rev} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """.format(rev=o_dsum("l.l_extendedprice * (1 - l.l_discount)")),
    doc="TPC-H Q3-style shipping priority: selective dim filter → fact join "
    "→ agg → top-k. Customer side filtered before the join (pushdown).",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    # merge hint: never broadcast the lineitem fact (see q05; the
    # filtered customer side still auto-broadcasts for the first join)
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    ).hint("merge")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           {rev} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """.format(rev=o_dsum("l.l_extendedprice * (1 - l.l_discount)")),
    doc="TPC-H Q5-style 6-way join; region/nation/supplier broadcast, "
    "orders⋈lineitem is the only big shuffle (co-keyed on orderkey).",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    # fact-fact join strategy pinned (r13, guide §3.1): without the hint
    # the planner broadcast LINEITEM itself whenever its pruned-column
    # size estimate slipped under the threshold — a single-threaded
    # driver hash build of the biggest table (3.7 s of the 5.4 s sf1
    # row) and a scale bug at 100 TB. SMJ keeps the orderkey shuffle the
    # docstring promises; measured 3.4x faster at sf1, 1.3x at sf0.1.
    l = table(spark, sf_dir, "lineitem").hint("merge")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
        SELECT ps.l_partkey, ps.ps_supplycost, s.s_name, s.s_acctbal, n.n_name
        FROM ps
        JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'),
    mn AS (SELECT l_partkey, MIN(ps_supplycost) AS min_cost
           FROM eu GROUP BY l_partkey)
    SELECT eu.s_acctbal, eu.s_name, eu.n_name,
           p.p_partkey, p.p_type, eu.ps_supplycost
    FROM eu
    JOIN mn ON eu.l_partkey = mn.l_partkey AND eu.ps_supplycost = mn.min_cost
    JOIN part p ON p.p_partkey = eu.l_partkey
    WHERE p.p_size <= 25 AND p.p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2-style min-cost supplier. The schema has no partsupp "
    "table, so the part-supplier cost relation is derived from lineitem "
    "(min observed unit price per (part, supplier)); the decorrelation "
    "shape is Q2's: a correlated MIN over the part's EUROPE suppliers, "
    "decorrelated into a per-partkey window min (one extra shuffle on "
    "partkey, no join-back). Part filter applied after the correlated min "
    "(Q2 semantics: the min ranges over suppliers of the part regardless "
    "of part attributes). Dims broadcast; MIN over doubles is "
    "order-insensitive so no decimal detour is needed.",
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = table(spark, sf_dir, "lineitem")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    eu = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(
            (F.col("p_size") <= 25) & (F.col("p_type") == "LARGE")
        )
    )
    return (
        eu.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost"
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH g AS (
        SELECT l.l_partkey, l.l_extendedprice * (1 - l.l_discount) AS v
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3')
    SELECT l_partkey AS ps_partkey, {v} AS part_value
    FROM g GROUP BY l_partkey
    HAVING {v} > (SELECT {v} * 0.001 FROM g)
    ORDER BY part_value DESC, ps_partkey
    """.format(v=o_dsum("v")),
    doc="TPC-H Q11-style important stock: per-part value share over one "
    "nation's suppliers, HAVING a scalar subquery over the global total "
    "(value derived from lineitem revenue — no partsupp in the schema). "
    "Decorrelated Spark-side into a broadcast crossJoin of the 1-row "
    "global aggregate; both per-part and total sums go through exact "
    "DECIMAL so the > comparison is bit-identical across engines.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    g = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"),
        )
    )
    per_part = g.groupBy("l_partkey").agg(dsum(F.col("v"), "part_value"))
    total = g.agg(dsum(F.col("v"), "_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_total") * 0.001)
        .select(F.col("l_partkey").alias("ps_partkey"), "part_value")
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "b13_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents WHERE doc_id < 100)
    SELECT doc_id, unnest(ws) AS word,
           CAST(generate_subscripts(ws, 1) AS BIGINT) AS pos
    FROM t
    """,
    doc="Python UDTF (Spark 3.5+): one input row → many output rows via a "
    "lateral join; arrow-optimized eval. The explode-with-ordinality shape "
    "the registry's other UDFs can't express.",
)
def b13_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, word string, pos bigint")
    class SplitWords:
        def eval(self, doc_id, text):  # noqa: ANN001
            for i, w in enumerate(text.split(" ")):
                yield doc_id, w, i + 1

    spark.udtf.register("tect_split_words", SplitWords)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT s.doc_id, s.word, s.pos "
        "FROM _udtf_docs d, LATERAL tect_split_words(d.doc_id, d.text) s"
    )


@register(
    "b06_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {sum_qty} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """.format(sum_qty=o_dsum("l_quantity")),
    doc="Explicit GROUPING SETS (beyond rollup/cube): three set shapes in "
    "one pass; Spark expands then aggregates once.",
)
def b06_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "b05_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS q50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (Spark `percentile` == DuckDB "
    "quantile_cont), rounded to 4 dp for cross-engine float stability. "
    "The approximate scale path is percentile_approx/approx_count_distinct "
    "(b05_approx_distinct).",
)
def b05_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_extendedprice, {p})"), 4).alias(name)
            for p, name in [(0.25, "q25"), (0.50, "q50"), (0.75, "q75")]
        ]
    )


@register(
    "b10_map_functions",
    oracle="""
    SELECT event_id,
           event_type AS t,
           CAST(user_id AS VARCHAR) AS u,
           'type,user' AS ks,
           CAST(2 AS BIGINT) AS n
    FROM events WHERE event_id < 2000
    """,
    doc="MapType construction + access: map_from_arrays, element_at by "
    "key, sorted map_keys, size — all JVM-side; oracle states the "
    "equivalent values directly.",
)
def b10_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("t"),
        F.element_at(m, "user").alias("u"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("ks"),
        F.size(m).cast("long").alias("n"),
    )


@register(
    "b07_lag_lead",
    oracle="""
    SELECT event_id,
           user_id,
           round(value - COALESCE(lag(value) OVER w, 0.0), 6) AS delta,
           lead(event_type) OVER w AS next_type,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Offset window functions: lag-delta, lead, ntile per user ordered "
    "by (ts, event_id) — unique tie-break keeps cross-engine order stable.",
)
def b07_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 6
        ).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           {rev} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """.format(rev=o_dsum("l.l_extendedprice * (1 - l.l_discount)")),
    doc="TPC-H Q10-style returned-item reporting: 4-way join, filter on "
    "the fact side pushed to parquet, nation broadcast, top-20 as "
    "TakeOrderedAndProject.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT {rev} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """.format(rev=o_dsum("l_extendedprice * l_discount")),
    doc="TPC-H Q6-style forecast revenue: pure filter+aggregate, every "
    "predicate in parquet PushedFilters, no shuffle beyond the final "
    "single-row combine.",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12-style priority counts (grouped by returnflag — the "
    "synthetic lineitem has no shipmode): orders ⋈ lineitem co-keyed on "
    "orderkey (the one necessary shuffle), conditional-count aggregation.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# b10 breadth: regexp / lateral explode / struct / json_tuple — each one
# query so the scalar-library claim spans the library (round-2 item 10)


@register(
    "b10_regexp",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, 'red|blue') AS is_colorful,
           CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a
    FROM part
    """,
    doc="Regular-expression functions: extract (capture group), replace "
    "(global — DuckDB needs the 'g' flag to match Spark), rlike, count. "
    "All JVM regex, codegen'd.",
)
def b10_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_type"), "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("red|blue").alias("is_colorful"),
        F.regexp_count(F.col("p_name"), F.lit("a")).cast("long").alias("n_a"),
    )


@register(
    "b10_explode",
    oracle="""
    SELECT p_partkey,
           CAST(generate_subscripts(w, 1) - 1 AS INTEGER) AS pos,
           unnest(w) AS word
    FROM (SELECT p_partkey, string_split(p_type, ' ') AS w FROM part)
    """,
    doc="Lateral array expansion: posexplode over split(p_type) — the "
    "row-multiplying generator shape (DuckDB: unnest zipped with "
    "generate_subscripts for ordinality).",
)
def b10_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_type"), " ")).alias("pos", "word"),
    )


@register(
    "b10_struct",
    oracle="""
    SELECT p_partkey,
           struct_pack(brand := p_brand, size := p_size).brand AS s_brand,
           CAST(struct_pack(brand := p_brand, size := p_size).size AS INTEGER)
             AS s_size,
           to_json(struct_pack(brand := p_brand, size := p_size)) AS s_json
    FROM part
    """,
    doc="StructType construction, field access, and JSON serialization "
    "(struct ≈ struct_pack; to_json emits identical compact key-ordered "
    "objects on both engines).",
)
def b10_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    s = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
    return p.select(
        "p_partkey",
        s.getField("brand").alias("s_brand"),
        s.getField("size").alias("s_size"),
        F.to_json(s).alias("s_json"),
    )


@register(
    "b10_json_tuple",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
    doc="json_tuple (UDTF-style multi-path JSON extractor) over the "
    "events.props string column; string and numeric projections.",
)
def b10_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.json_tuple(F.col("props"), "k").alias("k_str")
    ).withColumn("k_num", F.col("k_str").cast("long"))


@register(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): EXISTS decorrelates to "
    "a LEFT SEMI hash join on l_orderkey; 'late' predicate adapted to "
    "l_shipdate > o_orderdate + 60 days (synthetic lineitem has no "
    "commit/receipt dates). Semi-join carries only the key through the "
    "shuffle.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.00 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                 ELSE CAST(0 AS DECIMAL(27,6)) END) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14 (promotion effect): one month of lineitem joined to "
    "part (broadcast — part is dimension-sized), conditional revenue "
    "share. Decimal-exact sums keep the single output double stable "
    "cross-engine.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = F.broadcast(table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(27,6)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("promo_revenue")
        )
    )


@register(
    "b06_pivot",
    oracle="""
    SELECT l_returnflag,
           {a} AS qty_a,
           {n} AS qty_n,
           {r} AS qty_r
    FROM lineitem
    GROUP BY l_returnflag
    """.format(
        a=o_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END"),
        n=o_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END"),
        r=o_dsum("CASE WHEN l_linestatus = 'P' THEN l_quantity END"),
    ),
    doc="Pivot (wide aggregation): linestatus values become columns. "
    "Spark's pivot with an explicit value list compiles to conditional "
    "aggregates — one pass, partial-agg map-side, no extra shuffle vs a "
    "plain groupBy.",
)
def b06_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O", "P"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").alias("qty_a"),
        F.col("O").alias("qty_n"),
        F.col("P").alias("qty_r"),
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {qty} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """.format(qty=o_dsum("l.l_quantity")),
    doc="TPC-H Q18 (large-volume customer): HAVING-filtered aggregate keys "
    "feed a semi-join on the fact table, then re-aggregate with dims. The "
    "'big orders' set is tiny after the HAVING cut, so its join side "
    "broadcasts; top-100 is TakeOrdered, never a global sort.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q07_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, {rev} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """.format(rev=o_dsum("volume")),
    doc="TPC-H Q7 (volume shipping between two nations): lineitem joins "
    "supplier+orders+customer, both nation dims broadcast twice under "
    "different roles; the nation-pair disjunction prunes early. Facts "
    "shuffle on their join keys only.",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(vol, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "b07_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           {s} AS trailing_30d_spend
    FROM orders
    """.format(
        s="CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate "
        "RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)"
    ),
    doc="RANGE-framed window (time-based, not row-based): per customer, "
    "the trailing-30-day spend at each order. Spark expresses the range "
    "frame over the epoch-seconds ordering column; decimal-exact sum "
    "keeps frames hash-stable cross-engine.",
)
def b07_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d_spend"),
    )


@register(
    "b06_unpivot",
    oracle="""
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size_val,
             p_retailprice AS price_val
      FROM part
    ) UNPIVOT (val FOR metric IN (size_val AS 'size', price_val AS 'price'))
    """,
    doc="Unpivot (long-form melt): the inverse of b06_pivot, via Spark's "
    "unpivot/stack — two metric columns become (metric, val) rows; no "
    "shuffle, a pure row-expanding projection.",
)
def b06_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("price"),
        )
        .unpivot("p_partkey", ["size", "price"], "metric", "val")
    )


@register(
    "b05_argmax",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice + o_orderkey / 1e9) AS best_order,
           max(o_totalprice) AS best_price,
           arg_min(o_orderkey, o_orderdate + to_microseconds(CAST(o_orderkey AS BIGINT))) AS first_order
    FROM orders
    GROUP BY o_custkey
    """,
    doc="Selector aggregates (max_by/min_by ≈ arg_max/arg_min): per "
    "customer, the order id at the price maximum and the earliest order. "
    "Tie-breaks are made unique by folding the key into the ordering "
    "expression, so both engines select identical winners.",
)
def b05_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr("max_by(o_orderkey, o_totalprice + o_orderkey / 1e9)").alias(
            "best_order"
        ),
        F.max("o_totalprice").alias("best_price"),
        F.expr(
            "min_by(o_orderkey, o_orderdate + make_interval(0,0,0,0,0,0,o_orderkey/1e6))"
        ).alias("first_order"),
    )


@register(
    "b03_above_avg",
    oracle="""
    WITH nat_avg AS (
      SELECT c.c_nationkey AS nk, AVG(o.o_totalprice) AS avg_price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    )
    SELECT o.o_orderkey, c.c_nationkey, o.o_totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nat_avg a ON a.nk = c.c_nationkey
    WHERE o.o_totalprice > 1.5 * a.avg_price
    """,
    doc="Correlated scalar subquery shape ('orders 50% above their "
    "nation's average'), decorrelated to aggregate + re-join — the plan "
    "Catalyst produces for the subquery form. The per-nation average is "
    "tiny and broadcasts.",
)
def b03_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    oc = o.join(c, o.o_custkey == c.c_custkey)
    nat_avg = oc.groupBy("c_nationkey").agg(
        F.avg("o_totalprice").alias("avg_price")
    )
    return (
        oc.join(
            F.broadcast(nat_avg.withColumnRenamed("c_nationkey", "nk")),
            F.col("c_nationkey") == F.col("nk"),
        )
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "c_nationkey", "o_totalprice")
    )


@register(
    "b10_null_functions",
    oracle="""
    SELECT e.event_id,
           COALESCE(u.c_name, 'anonymous') AS who,
           CASE WHEN u.c_name IS NULL THEN e.user_id END AS missing_uid,
           IFNULL(u.c_name, CAST(e.user_id AS VARCHAR)) AS who2,
           CAST(u.c_name IS NOT DISTINCT FROM NULL AS BOOLEAN) AS is_anon,
           GREATEST(e.value, 10.0) AS v_floor,
           LEAST(e.value, 90.0) AS v_cap
    FROM events e
    LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 60) u
      ON e.user_id = u.c_custkey
    """,
    doc="Null-handling scalar functions over an outer join's null side: "
    "coalesce, nullif-style CASE, ifnull, null-safe equality, "
    "greatest/least.",
)
def b10_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    u = F.broadcast(
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 60)
        .select("c_custkey", "c_name")
    )
    j = e.join(u, e.user_id == u.c_custkey, "left")
    return j.select(
        "event_id",
        F.coalesce("c_name", F.lit("anonymous")).alias("who"),
        F.when(F.col("c_name").isNull(), F.col("user_id")).alias("missing_uid"),
        F.ifnull(F.col("c_name"), F.col("user_id").cast("string")).alias("who2"),
        F.col("c_name").eqNullSafe(F.lit(None)).alias("is_anon"),
        F.greatest("value", F.lit(10.0)).alias("v_floor"),
        F.least("value", F.lit(90.0)).alias("v_cap"),
    )


@register(
    "b14_sql_surface",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           {rev} AS revenue
    FROM nation n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """.format(rev=o_dsum("o.o_totalprice")),
    doc="The SQL entry point: the same engine surface through "
    "spark.sql(...) over register_views(...) temp views — Catalyst "
    "compiles identical plans from SQL text and DataFrame code; this row "
    "proves the text path end-to-end under the oracle gate.",
)
def b14_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tectonic_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                 AS revenue
        FROM nation n
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT {rev} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_type = 'PROMO'    AND l.l_quantity BETWEEN 1  AND 11)
       OR (p.p_type = 'STANDARD' AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_type = 'ECONOMY'  AND l.l_quantity BETWEEN 20 AND 30)
    """.format(rev=o_dsum("l.l_extendedprice * (1 - l.l_discount)")),
    doc="TPC-H Q19 shape (disjunctive predicates over a join): three OR'd "
    "conjunct groups mixing both sides' columns. The join stays a broadcast "
    "hash join on the equi key; the disjunction is a post-join residual "
    "plus per-side partial pushdown where derivable.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    cond = (
        ((F.col("p_type") == "PROMO") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_type") == "STANDARD") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_type") == "ECONOMY") & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H dashboard breadth (round 3): q08 q09 q13 q15 q17 q22


@register(
    "q08_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           ROUND({nat} / {all_}, 6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = cn.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
      AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY 1 ORDER BY 1
    """.format(
        nat=o_dsum(
            "CASE WHEN sn.n_name = 'NATION_3' "
            "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END"
        ),
        all_=o_dsum("l.l_extendedprice * (1 - l.l_discount)"),
    ),
    doc="TPC-H Q8 (national market share): one nation's share of PROMO "
    "revenue sold into ASIA customers over two years. Two nation roles "
    "(customer-side region filter, supplier-side share tag) — nation is "
    "joined twice under different aliases. Facts (lineitem, orders) "
    "shuffle on orderkey; every dimension broadcasts. Share = exact "
    "decimal sums, one double division, ROUND(6) pinned cross-engine.",
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31 23:59:59")
    )
    c = F.broadcast(table(spark, sf_dir, "customer"))
    cn = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    sn = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("sn_name"),
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == cn.n_nationkey)
        .join(r, cn.n_regionkey == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            rev.alias("rev"),
            F.when(F.col("sn_name") == "NATION_3", rev).otherwise(F.lit(0.0)).alias("nat_rev"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(F.col("nat_rev").cast("decimal(27,6)")).alias("_n"),
            F.sum(F.col("rev").cast("decimal(27,6)")).alias("_d"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_n").cast("double") / F.col("_d").cast("double"), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q09_product_type_profit",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice) * 0.1 AS ps_supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT sn.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {profit} AS sum_profit
    FROM lineitem l
    JOIN ps         ON ps.l_partkey = l.l_partkey AND ps.l_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY sn.n_name, 2 ORDER BY nation, o_year DESC
    """.format(
        profit=o_dsum(
            "l.l_extendedprice * (1 - l.l_discount) "
            "- ps.ps_supplycost * l.l_quantity"
        )
    ),
    doc="TPC-H Q9 (product-type profit): profit per supplier nation per "
    "year. No partsupp in the schema, so supply cost is proxied from "
    "lineitem (10% of the min observed line price per part+supplier) "
    "and joins back on the composite (partkey, suppkey) — a self-derived "
    "fact-fact shuffle join; orders co-shuffles on orderkey; "
    "part/supplier/nation broadcast. The proxy is deliberately "
    "DIVISION-FREE: prices are exact 2-decimal values and quantities "
    "integral, so every per-row profit lies on a 3-decimal grid and the "
    "DECIMAL(27,6) casts never hit a rounding tie cross-engine (a "
    "unit-price division puts rows exactly on 7-digit .5 boundaries "
    "where Spark's shortest-repr HALF_UP and DuckDB's exact-binary "
    "rounding disagree).",
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        (F.min("l_extendedprice") * 0.1).alias("ps_supplycost")
    ).withColumnsRenamed({"l_partkey": "ps_partkey", "l_suppkey": "ps_suppkey"})
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    sn = F.broadcast(table(spark, sf_dir, "nation"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        l.join(
            ps,
            (l.l_partkey == F.col("ps_partkey")) & (l.l_suppkey == F.col("ps_suppkey")),
        )
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("profit"), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (customer order-count distribution): LEFT OUTER join "
    "keeps order-less customers (c_count 0), double aggregation builds "
    "the histogram. The orders-side predicate lives in the JOIN condition "
    "(outer-join semantics: filtering after the join would drop the NULL "
    "rows). The schema has no o_comment, so the NOT-LIKE becomes a "
    "priority exclusion. Shuffles: custkey (join + 1st agg, one "
    "exchange), then the tiny histogram agg.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no, {rev} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """.format(rev=o_dsum("l_extendedprice * (1 - l_discount)")),
    doc="TPC-H Q15 (top supplier): quarterly revenue per supplier, keep "
    "the max-revenue supplier(s). The view + scalar-subquery MAX "
    "decorrelates into a broadcast 1-row crossJoin (same pattern as "
    "q11's HAVING); revenue through exact decimal so the = comparison "
    "is bit-identical cross-engine. One shuffle on suppkey; supplier "
    "broadcasts.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_max"))
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH a AS (
        SELECT l_partkey, {avg_qty} AS avg_qty
        FROM lineitem GROUP BY l_partkey)
    SELECT ROUND({rev} / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN a      ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < 0.2 * a.avg_qty
    """.format(
        avg_qty=o_davg("l_quantity"),
        rev=o_dsum("l.l_extendedprice"),
    ),
    doc="TPC-H Q17 (small-quantity-order revenue): correlated per-part "
    "AVG(l_quantity) subquery, decorrelated into a groupBy-then-join on "
    "partkey (lineitem joins its own aggregate — both sides shuffle on "
    "partkey once). The avg goes through exact decimal sum / count so "
    "the 0.2* threshold compares bit-identically cross-engine; part "
    "broadcasts. Global single-row aggregate (Q14-style, no GROUP BY).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    a = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg(F.col("l_quantity"), "avg_qty")
    )
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(
            (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(a, l.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT {avg_} AS a FROM customer WHERE c_acctbal > 0.0)
    SELECT n.n_name AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {tot} AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name ORDER BY cntrycode
    """.format(
        avg_=o_davg("c_acctbal"),
        tot=o_dsum("c.c_acctbal"),
    ),
    doc="TPC-H Q22 (global sales opportunity): customers richer than the "
    "global positive-balance average with no RECENT orders (every "
    "synthetic customer has some order, so 'never ordered' would be "
    "empty — the cutoff keeps the NOT-EXISTS shape with real survivors), "
    "grouped by nation (no c_phone in the schema, so the country-code "
    "prefix becomes the nation dimension). Shapes: scalar-subquery AVG "
    "as a broadcast 1-row crossJoin, NOT EXISTS as a left_anti join "
    "shuffling both sides on custkey (the date predicate pushed to the "
    "orders scan first); nation broadcasts.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal"), "a")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# round-3 additions: as-of join, sliding windows (batch form)


@register(
    "b04_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'),
    buys AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT b.event_id, b.user_id, b.ts, c.ts AS last_click_ts
    FROM buys b ASOF LEFT JOIN clicks c
      ON b.user_id = c.user_id AND b.ts >= c.ts
    """,
    doc="AS-OF join (the time-series operator Spark lacks natively; the "
    "oracle uses DuckDB's built-in ASOF JOIN): for every 'purchase' event, the "
    "latest 'click' by the same user at-or-before each 'purchase'. Implemented "
    "Spark-side as the scalable union-and-carry composition: tag both "
    "streams, sort within user_id on (ts, tag) — clicks before buys at "
    "equal ts, matching >= semantics — and carry the last non-null click "
    "timestamp forward with last(ignorenulls) over a running window. ONE "
    "shuffle on user_id, no range join, no per-row lookup; at 100 TB "
    "this is a single exchange + sort per partition key, the plan a "
    "dedicated as-of operator would produce.",
)
def b04_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(0).alias("_src"),
        F.col("ts").alias("_click_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(e.schema["ts"].dataType).alias("_click_ts"),
        "event_id",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ev_ts", "_src")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clicks.unionByName(buys)
        .withColumn("last_click_ts", F.last("_click_ts", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
        .select("event_id", "user_id", F.col("ev_ts").alias("ts"), "last_click_ts")
    )


@register(
    "b11_sliding_window",
    oracle="""
    SELECT ws AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sum_value} AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS ws,
               value
        FROM events)
    GROUP BY ws
    """.format(sum_value=o_dsum("value")),
    doc="Sliding windows, batch form (streaming window() with slide < "
    "duration): 2-hour windows every 1 hour — each event lands in exactly "
    "two window instances. The oracle replicates Spark's epoch-aligned "
    "instance assignment as a UNION ALL of the two shifted hour buckets. "
    "Spark expands instances with an internal explode before one "
    "partial-final aggregation — still a single shuffle.",
)
def b11_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# round-4 additions: the last TPC-H shapes (q16, q20, q21) — with these the
# full 22-query dashboard is covered (q01 == b05_pricing_summary, which
# carries all eight Q1 aggregates).


@register(
    "q16_parts_supplier_relationship",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 (parts/supplier relationship): how many distinct "
    "suppliers can serve each qualifying (brand, type, size) cell, "
    "excluding 'complaint' suppliers. The schema has no partsupp table, "
    "so the part-supplier relation is the DISTINCT (l_partkey, l_suppkey) "
    "projection of lineitem; no s_comment either, so negative account "
    "balance stands in for the complaint predicate — the NOT IN "
    "decorrelation shape is preserved. Plan: the NOT IN is a broadcast "
    "null-aware anti join (the excluded set is tiny), part is a broadcast "
    "dim after its selective filters, and the distinct + count-distinct "
    "shuffle on partkey/cell keys only. At 100 TB the single wide shuffle "
    "is the DISTINCT over (partkey, suppkey) — unavoidable, and minimal "
    "at 16 bytes per row.",
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").startswith("PROMO"))
            & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        )
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_potential_part_promotion",
    oracle="""
    WITH g AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(27,6)))
                   FILTER (WHERE l_shipdate <  TIMESTAMP '1997-01-01') AS avail,
               SUM(CAST(l_quantity AS DECIMAL(27,6)))
                   FILTER (WHERE l_shipdate >= TIMESTAMP '1997-01-01') AS demand
        FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s.s_suppkey IN (
          SELECT l_suppkey FROM g
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND avail * 2 > demand)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 (potential part promotion): suppliers in a nation set "
    "whose pre-1997 shipped quantity of any 'red' part exceeds half their "
    "post-1997 demand for it. No partsupp/availqty in the schema, so "
    "availability is the (part, supplier) quantity shipped before the "
    "cutoff and the correlated per-(part,supplier) scalar subquery of "
    "canonical Q20 decorrelates into ONE conditional aggregation "
    "(FILTER/when) over lineitem — one shuffle on (partkey, suppkey) "
    "computes both sides of the comparison. The comparison is avail*2 > "
    "demand in exact DECIMAL so the row set is bit-identical cross-engine. "
    "The part-name IN chain is a broadcast semi join; the supplier IN is a "
    "distinct-then-semi on suppkey; nation broadcasts.",
)
def q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    qdec = F.col("l_quantity").cast("decimal(27,6)")
    g = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(F.col("l_shipdate") < cutoff, qdec)).alias("avail"),
        F.sum(F.when(F.col("l_shipdate") >= cutoff, qdec)).alias("demand"),
    )
    red = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    excess = (
        g.join(F.broadcast(red), g.l_partkey == F.col("p_partkey"), "left_semi")
        .filter(F.col("avail") * 2 > F.col("demand"))
        .select("l_suppkey")
        .distinct()
    )
    n = F.broadcast(
        table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
        )
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_suppliers_who_kept_orders_waiting",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 (suppliers who kept orders waiting): for finished "
    "orders, count per supplier the lineitems that shipped >365 days "
    "after the order date where at least one OTHER supplier participated "
    "in the order (EXISTS) but NO other supplier was also late "
    "(NOT EXISTS). The schema lacks l_receiptdate/l_commitdate, so "
    "lateness is ship-lag vs the order date — the double-correlated "
    "EXISTS/NOT-EXISTS shape, the hard part of Q21, is intact. Plan "
    "(r13): the correlated probes are decorrelated into per-orderkey "
    "aggregates — NOT EXISTS ⟺ the order's late rows all share one "
    "suppkey (min==max over the late set), EXISTS ⟺ the order has a "
    "second supplier at all (min!=max over all lineitems) — so the two "
    "lineitem-vs-lineitem semi/anti probe joins with suppkey<> residuals "
    "collapse into two map-side-partial aggregations on the orderkey "
    "shuffle and an order-grained semi join; numwait is the sum of the "
    "qualifying orders' late-row counts, row-for-row identical to "
    "counting the surviving l1 rows. Supplier broadcasts. No nation "
    "filter — the synthetic supplier set is small enough that the full "
    "ranking is the more useful dashboard and no sf leaves the result "
    "trivially empty.",
)
def q21_suppliers_who_kept_orders_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # the one fact-fact join: pin SMJ so neither lineitem nor the
    # filtered-orders set is ever broadcast-built on the driver
    # (guide §3.1; the planner did both when the pruned estimates
    # slipped under the threshold — see q05)
    late = (
        l.join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # NOT EXISTS(other late supplier) ⟺ every late row of the order has
    # the same suppkey; that lone suppkey is then min==max, and the
    # order contributes its late-row count to that supplier.
    lagg = (
        late.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("late_min"),
            F.max("l_suppkey").alias("late_max"),
            F.count(F.lit(1)).alias("late_rows"),
        )
        .filter(F.col("late_min") == F.col("late_max"))
    )
    # EXISTS(other supplier in the order) ⟺ the order has ≥2 distinct
    # suppkeys anywhere in lineitem (the late supplier is one of them).
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("s_min"), F.max("l_suppkey").alias("s_max"))
        .filter(F.col("s_min") != F.col("s_max"))
        .select("l_orderkey")
    )
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    return (
        lagg.join(multi, "l_orderkey", "left_semi")
        .join(s, F.col("late_min") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --- b7 extension: EWMA (ordered fold, not expressible as a SQL window) ---

EWMA_ALPHA = 0.25  # exactly representable in binary => cross-engine exact


@register(
    "b07_ewma",
    oracle="""
    WITH s AS (
      SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           round(CASE WHEN len(vals) = 1 THEN vals[1]
                 ELSE list_reduce(vals, (acc, x) ->
                        CAST(0.25 AS DOUBLE) * x + CAST(0.75 AS DOUBLE) * acc)
                 END, 6) AS ewma
    FROM s
    """,
    doc="Exponentially-weighted moving average per user over the event "
    "stream (s_1 = v_1; s_i = 0.25 v_i + 0.75 s_{i-1}) — the classic "
    "time-decayed feature a recursive definition keeps OUT of SQL window "
    "functions (no associative combiner exists), so both engines run an "
    "ordered left fold: Spark aggregate() over the (ts, event_id)-sorted "
    "value array, DuckDB list_reduce with the same seed and literal "
    "DOUBLE coefficients. alpha = 0.25 is exactly representable in "
    "binary, so the two folds execute the identical IEEE op sequence — "
    "exact equality needs no tolerance, only the house 6dp output "
    "rounding. 100 TB shape: one user_id shuffle, per-user arrays "
    "bounded by per-key activity (chunk the fold by time range if a key "
    "is pathological).",
)
def b07_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    s = e.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda r: r["value"],
        ).alias("vals")
    )
    n = F.size("vals")
    ewma = F.aggregate(
        F.slice("vals", 2, n - 1),
        F.element_at("vals", 1),
        lambda acc, x: F.lit(EWMA_ALPHA) * x + F.lit(1.0 - EWMA_ALPHA) * acc,
    )
    return s.select(
        "user_id",
        n.cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )


# --- b15: sequential event-funnel analysis --------------------------------


@register(
    "b15_event_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT v.user_id,
           (c.user_id IS NOT NULL) AS clicked,
           (p.user_id IS NOT NULL) AS purchased,
           CAST(CASE WHEN p.user_id IS NOT NULL
                THEN epoch_us(CAST(t3 AS TIMESTAMP))
                     - epoch_us(CAST(t1 AS TIMESTAMP)) END AS BIGINT)
             AS us_to_convert
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="Sequential funnel analysis (view → click → purchase, the product-"
    "analytics conversion query): each stage's entry time is the MIN "
    "event time STRICTLY AFTER the previous stage's — ordering matters, "
    "a click before the first view does not count. Per-user output: "
    "stage flags + exact microsecond time-to-convert (integer timestamp "
    "arithmetic, no tolerance). 100 TB shape: three stage aggregations "
    "and two stage joins, ALL keyed on user_id — one partitioning "
    "reused across every stage (co-partitioned joins after the first "
    "shuffle), and each stage's frame shrinks monotonically.",
)
def b15_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c.select("user_id", "t2"), "user_id", "left")
        .join(p.select("user_id", "t3"), "user_id", "left")
        .select(
            "user_id",
            F.col("t2").isNotNull().alias("clicked"),
            F.col("t3").isNotNull().alias("purchased"),
            F.when(
                F.col("t3").isNotNull(),
                F.unix_micros(F.col("t3").cast("timestamp"))
                - F.unix_micros(F.col("t1").cast("timestamp")),
            ).alias("us_to_convert"),
        )
    )


# --- b16: cohort retention matrix -----------------------------------------


@register(
    "b16_retention_cohorts",
    oracle="""
    WITH su AS (SELECT user_id,
                       date_trunc('week', CAST(MIN(ts) AS TIMESTAMP))
                         AS cohort_week
                FROM events WHERE event_type = 'signup' GROUP BY user_id),
    act AS (SELECT DISTINCT e.user_id,
                   CAST(datediff('week',
                                 date_trunc('week', CAST(su.cohort_week AS TIMESTAMP)),
                                 date_trunc('week', CAST(e.ts AS TIMESTAMP)))
                        AS BIGINT) AS week_n
            FROM events e JOIN su ON su.user_id = e.user_id
            WHERE e.event_type <> 'signup'
              AND e.ts >= su.cohort_week),
    base AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
             FROM su GROUP BY cohort_week)
    SELECT CAST(CAST(su.cohort_week AS DATE) AS VARCHAR) AS cohort_week,
           act.week_n,
           CAST(COUNT(DISTINCT su.user_id) AS BIGINT) AS active_users,
           ANY_VALUE(base.cohort_size) AS cohort_size
    FROM su
    JOIN act ON act.user_id = su.user_id
    JOIN base ON base.cohort_week = su.cohort_week
    WHERE act.week_n BETWEEN 0 AND 8
    GROUP BY su.cohort_week, act.week_n
    """,
    doc="Cohort retention matrix — the product-analytics companion to the "
    "b15 funnel: users cohorted by signup week, activity bucketed by "
    "whole weeks since cohort start (weeks 0-8), distinct active users "
    "and cohort size per cell. All date_trunc/datediff integer "
    "arithmetic — exact cross-engine, no tolerance. 100 TB shape: the "
    "signup pass and the activity join both key on user_id (one "
    "partitioning reused), the matrix itself is "
    "cohorts × 9 cells — driver-trivial output from corpus-sized input.",
)
def b16_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    su = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts").cast("timestamp")).alias("cohort_week"))
    )
    act = (
        e.where(F.col("event_type") != "signup")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts").cast("timestamp")),
                    F.date_trunc("week", F.col("cohort_week")),
                )
                / 7
            )
            .cast("long")
            .alias("week_n"),
        )
        .distinct()
    )
    base = su.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        act.where(F.col("week_n").between(0, 8))
        .groupBy("cohort_week", "week_n")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(base, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_n",
            "active_users",
            "cohort_size",
        )
    )


# --- b17: statistical anomaly flags (z-score outliers) --------------------


@register(
    "b17_anomaly_zscore",
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS VARCHAR)
                  AS DOUBLE) AS s1,
             -- DECIMAL(18,6) squares keep full scale-12 products in BOTH
             -- engines (27,6 would force Spark to round each square to
             -- 6dp while DuckDB kept 12 — latent divergence for >3dp
             -- values, caught in review)
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))
                           * CAST(value AS DECIMAL(18,6))) AS VARCHAR)
                  AS DOUBLE) AS s2
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, m.n,
           round(m.s1 / m.n, 6) AS mean_value,
           CAST(COUNT(CASE WHEN m.n > 1 AND
                     (e.value - m.s1 / m.n) * (e.value - m.s1 / m.n)
                       > 4 * ((m.s2 - m.s1 * m.s1 / m.n) / (m.n - 1))
                     THEN 1 END) AS BIGINT) AS n_outliers
    FROM events e JOIN m ON m.user_id = e.user_id
    GROUP BY e.user_id, m.n, m.s1, m.s2
    """,
    doc="Per-user anomaly flags — |value − μ| > 2σ outlier counting, the "
    "data-quality screen of an event pipeline. The moments are derived "
    "from EXACT decimal sums (Σx and Σx² as DECIMAL(27,6), associative "
    "— order-insensitive), then converted to double ONCE via the "
    "correctly-rounded string hop; every per-row comparison after that "
    "is identical IEEE arithmetic on bit-identical inputs, so the "
    "outlier counts are exact cross-engine with no tolerance (the "
    "repo's decimal-moments trick extended from sums to variances). "
    "100 TB shape: one user_id-keyed moment aggregation (map-side "
    "combined) re-joined to the stream on the same key — the second "
    "pass reuses the first's partitioning.",
)
def b17_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("user_id", "value")
    # decimal(18,6) squares: 18+18+1 = 37 digits at scale 12 fits Spark's
    # 38-digit cap WITHOUT scale truncation, matching DuckDB exactly
    sq = F.col("value").cast("decimal(18,6)")
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value"), "s1"),
        F.sum(sq * sq).cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    dev2 = (F.col("value") - mu) * (F.col("value") - mu)
    return (
        e.join(m, "user_id")
        .groupBy("user_id", "n", "s1", "s2")
        .agg(
            F.count(
                F.when((F.col("n") > 1) & (dev2 > 4 * var), 1)
            ).alias("n_outliers")
        )
        .select(
            "user_id",
            "n",
            F.round(mu, 6).alias("mean_value"),
            F.col("n_outliers").cast("long").alias("n_outliers"),
        )
    )


# --- b18: event transition matrix (Markov counts) -------------------------


@register(
    "b18_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="First-order event transition matrix — per-user event streams "
    "ordered by (ts, event_id), adjacent pairs counted per (from, to) "
    "type: the Markov-chain summary behind next-action prediction and "
    "journey analysis. Pure integer counts over a deterministic "
    "ordering — exact cross-engine. 100 TB shape: ONE user_id shuffle "
    "for the LEAD window (per-user partitions are activity-bounded), "
    "then a 25-cell aggregation — output is type² rows regardless of "
    "corpus size.",
)
def b18_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("next_type", F.lead("event_type").over(w))
    return (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )

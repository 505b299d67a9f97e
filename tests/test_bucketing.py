"""Co-partitioned (bucketed) join tests — the shuffle-elimination strategy
for repeated fact-fact joins at 100 TB (SURVEY.md 'Optimize for scale':
co-locate joins via bucketing; a lineitem ⋈ orders co-bucketed on orderkey
joins with ZERO exchanges on either side)."""

from __future__ import annotations

import pytest

from tectonic_spark.plans import physical_plan
from tectonic_spark.tables import table


@pytest.fixture(scope="module")
def bucketed(spark):
    # managed tables land in ./spark-warehouse (gitignored); DROP TABLE
    # below removes the files again
    sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        table(spark, sf, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        table(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("ord_b")
    )
    yield spark.table("li_b"), spark.table("ord_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


class TestBucketedJoin:
    def test_cobucketed_join_has_no_exchange(self, spark, bucketed):
        li, ord_ = bucketed
        # disable broadcast so the join strategy decision is about shuffles;
        # restore the SESSION's original value, not a hardcoded one — a
        # wrong restore here once shifted later tests' plan shapes
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = li.join(ord_, li.l_orderkey == ord_.o_orderkey).select(
                "l_orderkey", "l_quantity", "o_totalprice"
            )
            plan = physical_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucket co-location removes both
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_bucketed_results_match_unbucketed(self, spark, bucketed):
        li, ord_ = bucketed
        sf = "/root/testdata/sf0.001"
        li2 = table(spark, sf, "lineitem")
        ord2 = table(spark, sf, "orders")
        want = li2.join(ord2, li2.l_orderkey == ord2.o_orderkey).count()
        got = li.join(ord_, li.l_orderkey == ord_.o_orderkey).count()
        assert got == want > 0

    def test_groupby_on_bucket_key_has_no_exchange(self, spark, bucketed):
        li, _ = bucketed
        from pyspark.sql import functions as F

        agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert "Exchange" not in physical_plan(agg)

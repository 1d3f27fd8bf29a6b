"""Bucketed co-located joins: the 100 TB fact⋈fact strategy.

Writing both join sides bucketed on the join key lets Spark plan the
join with zero Exchange — at scale this converts the biggest shuffle
in the flagship query into local merges. Pinned here end-to-end:
write bucketed tables, join, assert no shuffle in the physical plan.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_orders_spark.sources.readers import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    try:
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("li_bucketed")
        )
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("orders_bucketed")
        )
        lb = spark.table("li_bucketed")
        ob = spark.table("orders_bucketed")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout co-locates both sides
        # and the result is still correct
        unbucketed = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == unbucketed
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_unbucketed_same_join_shuffles(spark, sf_dir, no_broadcast):
    """Control: the identical join over plain parquet requires Exchanges
    on both sides — the cost the bucketed layout removes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select("l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan

"""Partitioned-layout round trip: pruning must show in the plan and
lose nothing in the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_orders_spark.plans.layout_queries import (
    read_pruned_month,
    stage_orders_by_month,
)


def test_partition_pruned_scan_plan_and_content(spark, sf_dir):
    path = stage_orders_by_month(spark, sf_dir)
    pruned = read_pruned_month(spark, path, "1996-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the month predicate must resolve against partition directories,
    # not row-level filters over the full scan
    assert "PartitionFilters" in plan and "1996-03" in plan
    expect = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.date_format("o_orderdate", "yyyy-MM") == "1996-03")
        .count()
    )
    assert pruned.count() == expect


def test_partition_layout_is_hive_style(spark, sf_dir):
    import os

    path = stage_orders_by_month(spark, sf_dir)
    months = [d for d in os.listdir(path) if d.startswith("o_month=")]
    assert len(months) > 10  # one directory per month of order dates

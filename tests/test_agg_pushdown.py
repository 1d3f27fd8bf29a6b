"""Parquet aggregate pushdown: COUNT/MIN/MAX answered from file
footers, never scanning a data page.

At 100 TB, "how many rows / what's the key range" must be a
metadata-only operation — parquet already stores per-rowgroup count
and column min/max, and Spark's DSv2 parquet scan can answer plain
ungrouped COUNT(*)/MIN/MAX straight from them when
`spark.sql.parquet.aggregatePushdown` is on. Pinned here with scoped
confs (the v2 source list changes plan shapes fleet-wide, so the
capability is exercised in isolation rather than leaked into every
registered query's session): the plan must show a non-empty
PushedAggregation with the aggregate AS the scan's output schema, and
the footer answer must equal the scanned answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_orders_spark.sources.readers import load_table


@pytest.fixture()
def v2_agg_pushdown(spark):
    old_push = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    yield
    spark.conf.set("spark.sql.parquet.aggregatePushdown", old_push)
    spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)


def _pushed_agg_line(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = [l for l in plan.splitlines() if "PushedAggregation" in l]
    assert lines, f"no BatchScan with PushedAggregation in plan:\n{plan}"
    return lines[0]


def test_count_min_max_answered_from_footers(spark, sf_dir, v2_agg_pushdown):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
    )
    scan = _pushed_agg_line(agg)
    # the aggregate IS the scan's output — no data column is read
    assert "COUNT(*)" in scan and "MIN(o_orderkey)" in scan and "MAX(o_orderkey)" in scan
    row = agg.collect()[0]
    # footer answer == scanned answer (computed via the default v1 path)
    base = load_table(spark, sf_dir, "orders")
    truth = base.agg(
        F.count(F.lit(1)), F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    assert (row["n"], row["lo"], row["hi"]) == tuple(truth)


def test_pushdown_declines_when_a_filter_needs_data(spark, sf_dir, v2_agg_pushdown):
    """A data filter forces real row reads — pushdown must NOT claim
    the aggregate then (footer stats can't apply a row predicate), and
    the result must still be right."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    agg = orders.filter(F.col("o_orderkey") % 2 == 0).agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "PushedAggregation: [COUNT" in l]
    assert not scans, "aggregate wrongly pushed through a data filter"
    n = agg.collect()[0]["n"]
    base = load_table(spark, sf_dir, "orders")
    assert n == base.filter(F.col("o_orderkey") % 2 == 0).count()

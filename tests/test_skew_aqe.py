"""AQE skew-join handling, pinned: a hot key must trigger Spark's
runtime skewed-partition split (the `skew=true` sort-merge join), the
safety net behind every keyed join in this engine when a 100 TB key
distribution turns out uglier than planned. Manual salting
(operators/skew.py) remains the deliberate tool; this test proves the
automatic layer is live and correctly configured rather than silently
disabled by a conf interaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.shuffle.partitions",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    # tiny thresholds so test-sized data counts as "skewed"
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


def test_aqe_splits_the_hot_key_partition(spark, skew_confs):
    """90% of the left rows share one key: after execution the adaptive
    plan must show the sort-merge join marked skew=true (the hot
    partition was split into parallel subtasks), and the join result
    must be exactly right."""
    n = 200_000
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, n, 1).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    joined = left.join(right, "k")
    # execute THIS DataFrame (count() would spawn its own QueryExecution
    # and leave joined's adaptive plan unfinalized)
    got = len(joined.collect())
    # every left row matches exactly one right row (keys 7 and the distinct ids)
    assert got == n
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan[:2000]}"

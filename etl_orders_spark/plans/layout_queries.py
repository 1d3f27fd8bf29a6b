"""Physical-layout queries: the write-side/scan-side halves of the
100 TB story exercised end to end.

`write_parquet(partition_by=...)` has existed since round 1
(sources/writers.py) but no registered path ever READ a partitioned
layout back — so partition pruning, the single biggest scan lever at
scale, was asserted in docs only. `partition_pruned_revenue` closes
that loop: it stages the orders table partitioned by month into
scratch space, reads it back through a month predicate (which Spark
resolves at planning time to a single partition directory), and
aggregates. The oracle runs the same aggregate over the unpartitioned
source — identical results prove the layout round-trip is lossless,
and tests/test_layout_queries.py pins the pruned-scan plan shape.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_orders_spark.plans.registry import register
from etl_orders_spark.sources.readers import load_table as T
from etl_orders_spark.sources.writers import write_parquet

_MONTH = "1996-03"


def staged_orders_path(sf_dir: str) -> str:
    """Deterministic scratch location for the partitioned copy of one
    sf_dir's orders table (content-addressed by source dir, so repeated
    runs overwrite their own staging, never another dataset's)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), "spark_graft_stage", f"orders_by_month_{key}")


def stage_orders_by_month(spark: SparkSession, sf_dir: str) -> str:
    """Write orders partitioned by order month (hive-style layout:
    one directory per o_month). At 100 TB this is the fact-table
    layout decision: facts partition on the dominant predicate column
    (date), so time-bounded queries scan only matching directories."""
    path = staged_orders_path(sf_dir)
    orders = T(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    write_parquet(orders, path, mode="overwrite", partition_by=["o_month"])
    return path


def read_pruned_month(spark: SparkSession, path: str, month: str) -> DataFrame:
    """Scan the partitioned layout through the partition predicate —
    Catalyst resolves `o_month = month` against the directory listing
    (PartitionFilters in the plan), so only that month's files are
    ever opened."""
    return spark.read.parquet(path).filter(F.col("o_month") == month)


@register(
    "partition_pruned_revenue",
    f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    WHERE strftime(CAST(o_orderdate AS DATE), '%Y-%m') = '{_MONTH}'
    GROUP BY o_orderstatus
    """,
    tags=("source", "sink", "layout", "agg"),
)
def partition_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-layout round trip: stage orders by month, read one
    month back through the partition predicate, aggregate revenue by
    status. The oracle aggregates the unpartitioned source with the
    equivalent month filter — equality proves the partitioned write +
    pruned read lose nothing."""
    path = stage_orders_by_month(spark, sf_dir)
    pruned = read_pruned_month(spark, path, _MONTH)
    return pruned.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )

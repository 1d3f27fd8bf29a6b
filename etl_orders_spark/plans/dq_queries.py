"""Data-quality gate queries built on operators/expectations.py.

Long-form `(check_name, violations, total)` — a load gate is
`max(violations) == 0`. The driver fixtures are clean by construction,
so every row here asserts 0; the violation-counting arithmetic itself
is exercised with corrupted fixtures in tests/test_expectations.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_orders_spark.operators.expectations import (
    in_range,
    in_set,
    matches,
    not_null,
    ref_integrity,
    run_row_checks,
)
from etl_orders_spark.plans.registry import register
from etl_orders_spark.sources.readers import load_table as T


@register(
    "dq_orders_lineitem",
    """
    SELECT 'not_null:o_orderdate' AS check_name,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM orders
    UNION ALL
    SELECT 'in_set:o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'matches:o_orderpriority',
           CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey',
           CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'in_range:l_quantity',
           CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'in_range:l_discount',
           CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'in_set:l_returnflag',
           CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ref:l_orderkey->o_orderkey',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    """,
    tags=("dq", "agg", "join"),
)
def dq_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The load gate the reference never had: 8 expectations over
    orders+lineitem — null/set/regexp/range row checks (one
    conditional-aggregate scan per table), key uniqueness (same pass),
    and lineitem→orders referential integrity (broadcast anti-join).
    Three scans total regardless of check count."""
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    o_checks = run_row_checks(
        orders,
        [
            not_null("o_orderdate"),
            in_set("o_orderstatus", ["O", "F", "P"]),
            matches("o_orderpriority", "^[1-5]-"),
        ],
        unique_keys=["o_orderkey"],
    )
    l_checks = run_row_checks(
        li,
        [
            in_range("l_quantity", 1, 50),
            in_range("l_discount", 0.0, 0.1),
            in_set("l_returnflag", ["A", "N", "R"]),
        ],
    )
    ri = ref_integrity(li, "l_orderkey", orders, "o_orderkey")
    return (
        o_checks.withColumnRenamed("check", "check_name")
        .unionByName(l_checks.withColumnRenamed("check", "check_name"))
        .unionByName(ri.withColumnRenamed("check", "check_name"))
    )

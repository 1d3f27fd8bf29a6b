"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in etl_orders_spark/plans/* and register themselves
into the registry (etl_orders_spark/plans/registry.py); this module is
a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's star-schema denormalization (reference:
    dags/etl.py:89-124) re-expressed over the driver's schema:
    lineitem ⋈ orders ⋈ customer ⋈ part + projection/rename/cleanup.
    """
    from etl_orders_spark.plans.core_queries import build_enriched_lineitems
    from etl_orders_spark.session import pin_session_defaults

    pin_session_defaults(spark)
    return build_enriched_lineitems(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_orders_spark.plans.registry import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL twins (DuckDB dialect) for every SQL-expressible query."""
    from etl_orders_spark.plans.registry import oracle_map

    return oracle_map()

"""SQL entry point: register the testdata star schema as views and run
arbitrary Spark SQL over it.

The reference had no query language at all (its "queries" were DAG
runs); this is the surface a reference user migrates to: point the
engine at a data directory, get named relations, write SQL. Views are
lazy — registering costs nothing until a query scans them, and every
query still gets pushdown/pruning because the views are plain scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_orders_spark.session import pin_session_defaults
from etl_orders_spark.sources.readers import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every testdata table as `{prefix}{name}` temp views.
    Returns the registered view names."""
    pin_session_defaults(spark)
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str, prefix: str = "") -> DataFrame:
    """One-shot: register views, run the query, return the DataFrame."""
    register_views(spark, sf_dir, prefix)
    return spark.sql(query)


def plan_summary(df: DataFrame) -> dict:
    """Scale-audit summary of a DataFrame's physical plan: the facts
    that must stay true at 100 TB, as data instead of a wall of text.
    Used by the plan-regression tests and handy interactively
    (`plan_summary(q(spark, sf))["nested_loop_joins"] == 0`)."""
    p = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": p.count("Exchange"),
        "reused_exchanges": p.count("ReusedExchange"),
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "nested_loop_joins": p.count("BroadcastNestedLoopJoin"),
        "cartesian_products": p.count("CartesianProduct"),
        "scans": p.count("FileScan"),
        "pushed_filters": "PushedFilters: [" in p
        and "PushedFilters: []" not in p,
        # note: under AQE the codegen markers only appear post-execution
        "whole_stage_codegen": "WholeStageCodegen" in p,
        "take_ordered": "TakeOrderedAndProject" in p,
    }

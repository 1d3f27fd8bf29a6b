"""The SQL entry point a reference user migrates to."""

from __future__ import annotations

from etl_orders_spark.sql import register_views, sql


def test_register_views_and_query(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert "lineitem" in names and "documents" in names
    out = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert out > 0


def test_sql_one_shot_join(spark, sf_dir):
    df = sql(
        spark,
        sf_dir,
        """
        SELECT c.c_mktsegment AS seg, COUNT(*) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
        """,
    )
    rows = {r["seg"]: r["n"] for r in df.collect()}
    assert rows and sum(rows.values()) > 0


def test_sql_views_push_filters(spark, sf_dir):
    df = sql(spark, sf_dir, "SELECT o_orderkey FROM orders WHERE o_totalprice > 50000")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(o_totalprice" in plan  # views stay pushdown-transparent


def test_sql_events_view_has_converted_timestamp(spark, sf_dir):
    df = sql(spark, sf_dir, "SELECT MIN(ts) AS t0 FROM events")
    assert df.schema["t0"].dataType.typeName() == "timestamp"


def test_plan_summary_reports_scale_facts(spark, sf_dir):
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.sql import plan_summary

    s = plan_summary(query_map()["q5_region_revenue"](spark, sf_dir))
    assert s["broadcast_hash_joins"] == 5
    assert s["sort_merge_joins"] == 0
    assert s["nested_loop_joins"] == 0
    # all five dim joins broadcast: every exchange is a broadcast, the
    # fact side never shuffles (the counts exclude ReusedExchange)
    assert s["broadcast_exchanges"] >= 1
    assert s["global_windows"] == 0
    t = plan_summary(query_map()["orderby_limit"](spark, sf_dir))
    assert t["take_ordered"]

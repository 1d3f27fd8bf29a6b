"""snapshot_diff: change typing and null-safe comparison on handcrafted
rows (the registry query exercises scale shape; this pins semantics)."""

from __future__ import annotations

from etl_orders_spark.operators.snapshot_diff import snapshot_diff

_SCHEMA = "k long, status string, amount double"


def test_all_change_types_and_null_safety(spark):
    old = spark.createDataFrame(
        [
            (1, "open", 10.0),   # unchanged -> dropped
            (2, "open", 10.0),   # status change
            (3, None, 5.0),      # NULL -> value counts as change
            (4, "done", None),   # value -> NULL counts as change
            (5, None, None),     # NULL == NULL -> unchanged, dropped
            (6, "gone", 1.0),    # deleted
        ],
        _SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "open", 10.0),
            (2, "closed", 10.0),
            (3, "filled", 5.0),
            (4, "done", 3.0),
            (5, None, None),
            (7, "fresh", 2.0),   # inserted
        ],
        _SCHEMA,
    )
    got = {
        r.k: (r.change_type, list(r.changed_cols))
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("update", ["status"]),
        3: ("update", ["status"]),
        4: ("update", ["amount"]),
        6: ("delete", []),
        7: ("insert", []),
    }


def test_multi_column_update_sorted(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], _SCHEMA)
    new = spark.createDataFrame([(1, "b", 2.0)], _SCHEMA)
    row = snapshot_diff(old, new, ["k"]).collect()[0]
    assert row.change_type == "update"
    assert list(row.changed_cols) == ["amount", "status"]  # sorted


def test_incremental_rollup_matches_full_recompute(spark, sf_dir):
    """Delta maintenance must converge to the direct snapshot-B rollup
    exactly (integer cents cancel without residue), and the delta this
    query applies must stay far smaller than the fact table — the
    entire point of maintaining instead of recomputing."""
    from pyspark.sql import functions as F

    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.sources.readers import load_table

    maintained = {
        r.status: (r.n_orders, r.revenue_cents)
        for r in query_map()["incremental_status_rollup"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    direct = {
        r.status: (r.n, r.c)
        for r in o.filter("o_orderkey % 97 <> 0")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("c"),
        )
        .collect()
    }
    assert maintained == direct
    n_fact = o.count()
    n_delta = o.filter(
        "o_orderkey % 89 = 0 OR o_orderkey % 97 = 0 OR o_orderkey % 100 = 50"
    ).count()
    assert n_delta < n_fact / 10

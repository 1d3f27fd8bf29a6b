"""Count-min sketch contracts: never undercounts, exact when collision-
free, and merges by cell-wise addition."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_orders_spark.operators.countmin import countmin_build, countmin_estimate


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k string, w long")


def test_countmin_never_undercounts(spark):
    data = [(f"key{i}", (i % 7) + 1) for i in range(200)]
    df = _kv(spark, data)
    sk = countmin_build(df, "k", "w", depth=4, width=64)
    est = {
        r["k"]: r["est"]
        for r in countmin_estimate(sk, df.select("k"), "k", depth=4, width=64).collect()
    }
    exact = {k: w for k, w in data}
    assert all(est[k] >= exact[k] for k in exact)


def test_countmin_exact_when_wide(spark):
    # few keys + wide matrix -> collisions vanish, min over rows is exact
    data = [("a", 5), ("b", 3), ("c", 11)]
    df = _kv(spark, data)
    sk = countmin_build(df, "k", "w", depth=4, width=4096)
    est = {
        r["k"]: r["est"]
        for r in countmin_estimate(sk, df.select("k"), "k", depth=4, width=4096).collect()
    }
    assert est == {"a": 5, "b": 3, "c": 11}


def test_countmin_merge_is_cellwise_sum(spark):
    """sketch(part1) + sketch(part2) == sketch(whole) — the mergeability
    that lets partials persist per day/partition and combine later."""
    d1 = [("a", 2), ("b", 1), ("x", 4)]
    d2 = [("a", 3), ("c", 7)]
    s1 = countmin_build(_kv(spark, d1), "k", "w", depth=3, width=32)
    s2 = countmin_build(_kv(spark, d2), "k", "w", depth=3, width=32)
    merged = (
        s1.unionByName(s2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_build(_kv(spark, d1 + d2), "k", "w", depth=3, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_countmin_unweighted_counts_rows(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    sk = countmin_build(df, "k", depth=2, width=64)
    est = {
        r["k"]: r["est"]
        for r in countmin_estimate(sk, df.distinct(), "k", depth=2, width=64).collect()
    }
    assert est == {"a": 2, "b": 1}


def test_incremental_rollup_matches_full(spark, sf_dir):
    from etl_orders_spark.plans.registry import query_map

    inc = query_map()["incremental_rollup_maintenance"](spark, sf_dir)
    full = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("rev_cents"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_sample_per_group_deterministic(spark, sf_dir):
    from etl_orders_spark.plans.registry import query_map

    q = query_map()["sample_per_group_docs"]
    a = sorted(map(tuple, q(spark, sf_dir).collect()))
    b = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert a == b
    per_src = {}
    for src, _doc, _rk in a:
        per_src[src] = per_src.get(src, 0) + 1
    assert all(v <= 5 for v in per_src.values())

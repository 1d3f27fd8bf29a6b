"""Unit contract of the materialize-once helpers: cache_stage's
warm reuse / invalidation / external-clear recovery, and the scan
audit's live-scan counter on synthetic plan text."""

from __future__ import annotations

from etl_orders_spark.operators.materialize import _STAGE_CACHE, cache_stage


def _is_cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_cache_stage_warm_reuse_and_bounded_eviction(spark):
    key = "test.cache_stage.unit"
    _STAGE_CACHE.pop(key, None)

    a = cache_stage(spark.range(10).selectExpr("id * 2 AS x"), key)
    assert a.count() == 10 and _is_cached(a)

    # identical plan -> the SAME cached frame comes back (warm reuse)
    b = cache_stage(spark.range(10).selectExpr("id * 2 AS x"), key)
    assert b is a

    # a SECOND distinct plan coexists (two slots: interleaved builds
    # over two inputs must not evict each other's cache)
    c = cache_stage(spark.range(5).selectExpr("id * 3 AS x"), key)
    assert c is not a
    assert c.count() == 5 and _is_cached(c) and _is_cached(a)
    assert cache_stage(spark.range(10).selectExpr("id * 2 AS x"), key) is a

    # a THIRD distinct plan evicts the least-recently-used entry —
    # which is c after a's warm hit refreshed its recency
    d = cache_stage(spark.range(3).selectExpr("id * 5 AS x"), key)
    assert d.count() == 3 and _is_cached(d)
    assert _is_cached(a) and not _is_cached(c)

    _STAGE_CACHE.pop(key, None)


def test_cache_stage_recovers_from_external_clear(spark):
    """catalog.clearCache() drops the blocks but leaves the Python
    handle; the next call must re-persist instead of returning a
    frame that silently recomputes per consumer."""
    key = "test.cache_stage.cleared"
    _STAGE_CACHE.pop(key, None)

    a = cache_stage(spark.range(7).selectExpr("id AS x"), key)
    a.count()
    spark.catalog.clearCache()
    assert not _is_cached(a)
    b = cache_stage(spark.range(7).selectExpr("id AS x"), key)
    assert _is_cached(b)

    spark.catalog.clearCache()
    _STAGE_CACHE.pop(key, None)


_SCAN = (
    "FileScan parquet [a] Batched: true, Location: InMemoryFileIndex(1 paths)"
    "[file:/data/{t}.parquet], ReadSchema: struct<a:bigint>"
)


def _plan(lines: list[str]) -> str:
    return "\n".join(lines)


def test_live_scan_counts_on_synthetic_plans():
    from tools.scan_audit import live_scan_counts

    # two live scans of one table -> counted twice
    p = _plan(["*(1) Join", f"   :- {_SCAN.format(t='orders')}", f"   +- {_SCAN.format(t='orders')}"])
    assert live_scan_counts(p)["orders.parquet"] == 2

    # the same cache embedded twice (fresh ids, different tree prefix)
    # -> ONE fill
    block = [
        "+- InMemoryTableScan [a#{i}]",
        "      +- InMemoryRelation [a#{i}], StorageLevel(disk, memory)",
        "            +- " + _SCAN.format(t="docs") + " #{i}",
    ]
    p = _plan(
        ["*(1) Join"]
        + ["   :- " + ln.format(i=1) for ln in block]
        + ["   +- " + ln.format(i=2) for ln in block]
    )
    assert live_scan_counts(p)["docs.parquet"] == 1

    # "== Initial Plan ==" subtrees never executed -> not counted
    p = _plan(
        [
            "AdaptiveSparkPlan isFinalPlan=true",
            "+- == Final Plan ==",
            f"   {_SCAN.format(t='part')}",
            "+- == Initial Plan ==",
            f"   {_SCAN.format(t='part')}",
            f"   {_SCAN.format(t='part')}",
        ]
    )
    assert live_scan_counts(p)["part.parquet"] == 1

    # a cache built FROM another cache: inner fill counted once, not
    # re-counted inside the outer block's embedded copy
    inner = [
        "+- InMemoryRelation [b#{i}], StorageLevel(disk, memory)",
        "      +- " + _SCAN.format(t="events") + " #{i}",
    ]
    outer = (
        ["+- InMemoryRelation [c#{j}], StorageLevel(disk, memory)"]
        + ["      +- Project [c#{j}]"]
        + ["         " + ln.format(i="{j}9") for ln in inner]
    )
    p = _plan(
        ["*(1) Join"]
        + ["   :- " + ln.format(i=5) for ln in inner]
        + ["   +- " + ln.format(j=7) for ln in outer]
    )
    assert live_scan_counts(p)["events.parquet"] == 1


def test_const_rows_values_and_sameresult_stability(spark):
    """const_rows must (a) produce the same rows/schema as the
    createDataFrame it replaces and (b) build sameResult-STABLE plans
    across invocations — the property createDataFrame lacks (its
    LocalRelation rows compare by reference), which silently defeats
    every keyed cache_stage downstream."""
    from etl_orders_spark.operators.materialize import const_rows

    rows = [("a", 1), ("b", 2), ("c", 3)]
    fields = [("name", "string"), ("n", "long")]
    c1 = const_rows(spark, rows, fields)
    c2 = const_rows(spark, rows, fields)
    ref = spark.createDataFrame(rows, "name string, n long")
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, ref.collect()))
    assert c1.schema == ref.schema

    def same(a, b):
        return (
            a._jdf.queryExecution().analyzed().sameResult(
                b._jdf.queryExecution().analyzed()
            )
        )

    assert same(c1, c2)  # the property the keyed caches rely on
    assert not same(
        spark.createDataFrame(rows, "name string, n long"),
        spark.createDataFrame(rows, "name string, n long"),
    )  # documents WHY const_rows exists; if this ever starts passing,
    #    createDataFrame became canonicalizable and const_rows can go

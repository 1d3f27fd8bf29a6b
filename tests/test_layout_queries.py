"""Partitioned-layout round trip: pruning must show in the plan and
lose nothing in the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_orders_spark.plans.layout_queries import (
    read_pruned_month,
    stage_orders_by_month,
)


def test_partition_pruned_scan_plan_and_content(spark, sf_dir):
    path = stage_orders_by_month(spark, sf_dir)
    pruned = read_pruned_month(spark, path, "1996-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the month predicate must resolve against partition directories,
    # not row-level filters over the full scan
    assert "PartitionFilters" in plan and "1996-03" in plan
    expect = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.date_format("o_orderdate", "yyyy-MM") == "1996-03")
        .count()
    )
    assert pruned.count() == expect


def test_partition_layout_is_hive_style(spark, sf_dir):
    import os

    path = stage_orders_by_month(spark, sf_dir)
    months = [d for d in os.listdir(path) if d.startswith("o_month=")]
    assert len(months) > 10  # one directory per month of order dates


def test_zorder_stage_roundtrip_and_file_tightness(spark, sf_dir):
    """The staged Z-ordered copy must (a) lose no rows, (b) give each
    file a per-file key range narrower than the global span on BOTH
    clustered dimensions — the footer-stats tightness row-group
    skipping prunes on (the query's oracle proves losslessness on
    values; this pins the physical layout claim)."""
    import os

    import pyarrow.parquet as pq

    from etl_orders_spark.plans.layout_queries import stage_lineitem_zorder

    path = stage_lineitem_zorder(spark, sf_dir)
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert spark.read.parquet(path).count() == src.count()

    parts = [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(parts) > 4
    spans = {"l_partkey": [], "l_suppkey": []}
    globals_ = {}
    for p in parts:
        md = pq.read_metadata(p)
        for col in spans:
            idx = md.schema.names.index(col)
            mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans[col].append(mx - mn)
            g = globals_.setdefault(col, [mn, mx])
            g[0], g[1] = min(g[0], mn), max(g[1], mx)
    for col, ss in spans.items():
        full = globals_[col][1] - globals_[col][0]
        mean_span = sum(ss) / len(ss)
        # Morton clustering: every file covers a narrow band of BOTH
        # dimensions, not just a leading sort column
        assert mean_span < full * 0.55, f"{col}: mean file span {mean_span} vs global {full}"


def test_fs_score_threshold_semantics(spark, sf_dir):
    """Every surviving pair must clear the review threshold, carry a
    name band ≤ 3 (the miss weight makes the threshold unreachable
    without name evidence), and appear exactly once (id_a < id_b)."""
    from etl_orders_spark.plans.linkage_queries import _FS_THRESHOLD, fs_score_customers

    out = fs_score_customers(spark, sf_dir).collect()
    assert out, "expected surviving candidate pairs at test SF"
    seen = set()
    for r in out:
        assert r.score >= _FS_THRESHOLD
        assert r.name_dist <= 3
        assert r.id_a < r.id_b
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))


def test_bucketed_join_elides_exchange_and_sort(spark, sf_dir):
    """The point of the bucketed layout: the merge join over the two
    bucketed tables must show NO Exchange and NO Sort beneath the
    SortMergeJoin in the physical plan (bucket count matches, sortBy
    matches the join key), while the same join over plain parquet
    scans shuffles both sides. Values are checked by the lane's DuckDB
    oracle; this pins the plan shape the layout exists to buy."""
    from etl_orders_spark.plans.registry import query_map

    df = query_map()["bucketed_colocated_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    # beneath the join: bucketed scans only — no exchange, no sort
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Sort [o_orderkey" not in join_part, join_part
    assert "Sort [l_orderkey" not in join_part, join_part
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_bucketed_staging_drops_stale_catalog_entry(spark, tmp_path):
    """Regression (round-8 review): within a live session the
    tableExists fast path must NOT outlive the staged copy's
    freshness — when the source parquet is regenerated, the next
    ensure_bucketed_pair call has to drop the catalog entry and
    restage instead of serving the stale /tmp copy."""
    import os
    import shutil
    import time

    from etl_orders_spark.plans.layout_queries import (
        _BKT_BUCKETS,
        _staged_path,
        ensure_bucketed_pair,
    )

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    for t in ("orders", "lineitem"):
        shutil.copy(os.path.join(src, f"{t}.parquet"), sf_dir)

    o, l = ensure_bucketed_pair(spark, sf_dir)
    n_orders = o.count()
    assert n_orders > 0

    # regenerate the source: keep the first half of the orders rows,
    # schema-preserving (pyarrow slice — a pandas round trip would
    # retype dates/decimals and fail the restage for the wrong reason)
    import pyarrow.parquet as pq

    src_path = os.path.join(sf_dir, "orders.parquet")
    tbl = pq.read_table(src_path)
    kept = tbl.slice(0, tbl.num_rows // 2)
    time.sleep(1.1)  # mtime granularity
    pq.write_table(kept, src_path)

    o2, _ = ensure_bucketed_pair(spark, sf_dir)
    assert o2.count() == kept.num_rows  # restaged, not the stale copy
    path = _staged_path(sf_dir, "bkt_orders", params=f"buckets={_BKT_BUCKETS}|v2")
    success = os.path.join(path, "_SUCCESS")
    assert os.path.getmtime(success) >= os.path.getmtime(
        os.path.join(sf_dir, "orders.parquet")
    )


def test_compaction_shrinks_files_and_preserves_rows(spark, sf_dir):
    """The compaction ledger: the fragmented fixture really is
    small-files-pathological (one file per round-robin partition),
    the compacted copy collapses them to the byte-sized target count,
    and not a row is lost or duplicated in the rewrite."""
    import glob
    import os

    from etl_orders_spark.plans.layout_queries import (
        _CMP_FRAG,
        stage_compacted_events,
        stage_fragmented_events,
    )
    from etl_orders_spark.sources.readers import load_table as T

    frag = stage_fragmented_events(spark, sf_dir)
    comp, _ = stage_compacted_events(spark, sf_dir)
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    n_comp = len(glob.glob(os.path.join(comp, "*.parquet")))
    assert n_frag == _CMP_FRAG
    assert n_comp < n_frag / 10
    src_ids = {r.event_id for r in T(spark, sf_dir, "events").select("event_id").collect()}
    comp_ids = [r.event_id for r in spark.read.parquet(comp).select("event_id").collect()]
    assert len(comp_ids) == len(src_ids)
    assert set(comp_ids) == src_ids

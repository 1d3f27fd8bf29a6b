"""Interval/time query laws (plans/time_queries.py).

The asof/range/sessionize operator tests live in
test_asof_sessionize.py; this module covers the registered
interval-overlap lane.
"""

def test_interval_overlap_banding_matches_naive_cross(spark, sf_dir):
    """The bucket-banded interval-overlap join must equal the naive
    cross-join-plus-filter evaluation row-for-row — pinning both the
    banding completeness (no overlapping pair missed when intervals
    span bucket boundaries) and the count-once rule (no pair counted
    twice from shared buckets)."""
    from pyspark.sql import functions as F

    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.plans.time_queries import (
        _IOV_BASE,
        _IOV_N_PROMOS,
        _IOV_PROMO_EVERY,
        _IOV_PROMO_LEN,
    )
    from etl_orders_spark.sources.readers import load_table as T

    got = {
        (r.promo_id, r.n_shipments, r.revenue)
        for r in query_map()["interval_overlap_promo_shipments"](spark, sf_dir).collect()
    }

    promos = spark.range(_IOV_N_PROMOS).select(
        F.col("id").alias("promo_id"),
        F.date_add(
            F.to_date(F.lit(_IOV_BASE)), (F.col("id") * _IOV_PROMO_EVERY).cast("int")
        ).alias("p_start"),
        F.date_add(
            F.to_date(F.lit(_IOV_BASE)),
            (F.col("id") * _IOV_PROMO_EVERY + _IOV_PROMO_LEN).cast("int"),
        ).alias("p_end"),
    )
    li = T(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.to_date("l_shipdate").alias("s"),
        F.date_add(
            F.to_date("l_shipdate"), (F.col("l_orderkey") % 20 + 3).cast("int")
        ).alias("r"),
    )
    naive = (
        li.crossJoin(promos)
        .filter((F.col("s") <= F.col("p_end")) & (F.col("p_start") <= F.col("r")))
        .groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shipments"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
    )
    want = {
        (r.promo_id, r.n_shipments, r.revenue)
        for r in promos.join(naive, "promo_id", "left")
        .select(
            "promo_id",
            F.coalesce("n_shipments", F.lit(0)).cast("long").alias("n_shipments"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .collect()
    }
    assert got == want
    assert sum(1 for _, n, _ in got if n > 0) >= 10  # non-vacuous overlap mass

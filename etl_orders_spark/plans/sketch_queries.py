"""Mergeable-sketch queries (Apache DataSketches HLL via Spark built-ins).

The 100 TB pattern these demonstrate: pre-aggregate each partition /
day / file into a tiny fixed-size sketch ONCE, persist the binary,
then answer distinct-count questions over any combination of slices by
merging sketches — never rescanning the raw data. `hll_union_agg` of
the partials is equivalent to sketching the union directly, so a
hypertable-style rollup (day → month → total) costs one map pass plus
kilobytes of shuffle, versus a full shuffle of raw keys for exact
COUNT(DISTINCT).

Sketch binaries are engine-specific, so these register rows-only (no
DuckDB hash oracle); the accuracy and mergeability contracts are
pinned in tests/test_sketch.py instead (estimate within the published
HLL error envelope of exact, union-of-partials == direct sketch,
parquet round-trip of the binary column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_orders_spark.plans.registry import register
from etl_orders_spark.sources.readers import load_table as T

_LG_K = 12  # 2^12 buckets -> ~1.6% relative standard error, 4 KiB per sketch


@register(
    "hll_daily_users",
    None,  # sketch binaries are engine-specific: accuracy pinned in tests, not vs DuckDB
    tags=("sketch", "events", "agg"),
)
def hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct users, estimated from a per-day HLL sketch,
    alongside the exact count for self-audit. One shuffle on day; the
    sketch column is what a real rollup would persist (4 KiB/day
    regardless of cardinality)."""
    ev = T(spark, sf_dir, "events").select(F.to_date("ts").alias("day"), "user_id")
    return (
        ev.groupBy("day")
        .agg(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(_LG_K)).alias("sk"),
            F.count_distinct("user_id").cast("long").alias("exact_users"),
        )
        .select(
            "day",
            F.hll_sketch_estimate("sk").cast("long").alias("est_users"),
            "exact_users",
        )
        .orderBy("day")
    )


@register(
    "hll_rollup_total_users",
    None,  # engine-specific sketch binaries; mergeability pinned in tests
    tags=("sketch", "events", "agg", "rollup"),
)
def hll_rollup_total_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup: per-day sketches union-merged into one global
    estimate WITHOUT revisiting raw events — the answer a 100 TB
    deployment reads from kilobytes of persisted partials. Emits the
    merged estimate next to the direct-sketch and exact counts so the
    equivalence is visible in the output itself."""
    ev = T(spark, sf_dir, "events").select(F.to_date("ts").alias("day"), "user_id")
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(_LG_K)).alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_merged")
    )
    direct = ev.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(_LG_K))
        )
        .cast("long")
        .alias("est_direct"),
        F.count_distinct("user_id").cast("long").alias("exact_total"),
    )
    return merged.crossJoin(direct)

"""Measured scale probes for the round-8 lanes (SCALE.md):

1. binary_quant_ann_rerank's screen on the 1x/10x/100x embedding
   replicas — signature fold + hamming screen + rerank wall time, and
   screen bytes touched (8 B/vector) vs the float corpus, to show the
   two-stage shape's cost grows with ONE cheap linear scan.
2. bucketed_colocated_join at sf0.1 — the one-time bucketed staging
   write vs the per-query saving against the same join over plain
   parquet scans (shuffle both sides), which is the amortization
   argument bucketing rests on.

Usage:
    python tools/probe_r8_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from etl_orders_spark.functions.vectors import cosine_similarity, sign_bits_long
    from etl_orders_spark.operators.topk import topk_per_group
    from etl_orders_spark.plans.vector_queries import _ANN_K, _BQ_CAND
    from etl_orders_spark.session import get_spark
    from etl_orders_spark.sources.readers import load_table as T

    spark = get_spark("probe_r8_lanes")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]

    # --- binary-quant ANN across replicas (mirrors the lane's plan) ---
    for sf_dir in dirs:
        emb = T(spark, sf_dir, "embeddings")
        corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        t0 = time.time()
        sigs = corpus.withColumn("sig", sign_bits_long("v"))
        q = sigs.filter(F.col("vec_id") % 10_000_000 < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("sig").alias("qsig"),
        )
        scored = (
            sigs.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "hamming",
                F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))).cast("long"),
            )
        )
        # the lane's OWN knobs (plans/vector_queries.py) so a later
        # retune can't leave this probe measuring a stale plan shape
        cand = topk_per_group(
            scored, ["query_id"], [F.asc("hamming"), F.asc("vec_id")], _BQ_CAND
        )
        out = topk_per_group(
            cand.withColumn("cos", F.round(cosine_similarity("qv", "v"), 6)),
            ["query_id"],
            [F.desc("cos"), F.asc("vec_id")],
            _ANN_K,
        )
        rows = out.count()
        wall = time.time() - t0
        n = corpus.count()
        nq = q.count()
        print(
            f"BINQUANT {sf_dir}: n={n} queries={nq} out={rows} wall={wall:.1f}s "
            f"(screen touches {n * 8 / 1e6:.1f} MB of signatures vs "
            f"{n * 64 * 8 / 1e6:.1f} MB of float64 vectors)",
            flush=True,
        )

    # --- bucketed join amortization at the 1x dir ---
    import shutil

    from etl_orders_spark.plans.layout_queries import (
        _BKT_BUCKETS,
        _staged_path,
        ensure_bucketed_pair,
    )

    sf_dir = dirs[0]
    # force a CLEAN staging so "stage(once)" times the saveAsTable
    # write, not the tableExists/re-attach fast path a prior bench or
    # test run in this environment would otherwise leave behind
    for name in ("orders", "lineitem"):
        path = _staged_path(sf_dir, f"bkt_{name}", params=f"buckets={_BKT_BUCKETS}|v2")
        tbl = f"bkt_{name}_{os.path.basename(path).rsplit('_', 1)[1]}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    o, l = ensure_bucketed_pair(spark, sf_dir)
    stage = time.time() - t0

    def run_join(lhs, rhs, lk, rk):
        t = time.time()
        (
            lhs.hint("merge")
            .join(rhs, lhs[lk] == rhs[rk])
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.format("noop").mode("overwrite").save()
        )
        return time.time() - t

    # warm both paths once, then time 3 reps each
    plain_o = T(spark, sf_dir, "orders")
    plain_l = T(spark, sf_dir, "lineitem")
    run_join(o, l, "o_orderkey", "l_orderkey")
    run_join(plain_o, plain_l, "o_orderkey", "l_orderkey")
    b = min(run_join(o, l, "o_orderkey", "l_orderkey") for _ in range(3))
    p = min(run_join(plain_o, plain_l, "o_orderkey", "l_orderkey") for _ in range(3))
    print(
        f"BUCKETED {sf_dir}: stage(once)={stage:.1f}s bucketed-join={b:.2f}s "
        f"plain-shuffle-join={p:.2f}s per-query saving={p - b:.2f}s",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Headline benchmark: runs every bench-tagged registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced through the noop sink so the full plan executes
(count() would let Catalyst prune the projected columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    from etl_orders_spark.plans.registry import bench_queries
    from etl_orders_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # one untimed warmup run per query (SPARK_GRAFT_BENCH_WARMUP=0 to skip):
    # measures steady-state execution rather than one-off Catalyst plan
    # compilation / codegen JIT, which amortize to zero at 100 TB
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    # best-of-N timed runs (default 2): single-run times on a shared
    # box carry ±20% scheduler/GC noise; the minimum is the standard
    # low-variance estimator of a query's true cost
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))

    timings: dict[str, float] = {}
    for name, builder in bench_queries().items():
        if warmup:
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(reps):
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

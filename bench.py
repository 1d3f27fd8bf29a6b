"""Headline benchmark: runs every bench-tagged registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The FINAL stdout line is the compact
warm-only object the driver parses:

    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {name: warm_sec, ...}, "sf": 0.1}

The cold column (first-execution timings) is emitted SEPARATELY — a
preceding stdout JSON line plus a ``bench_cold.json`` sidecar — and
must NEVER be folded into the final line: the driver captures only
the tail of output (~2 KB), and round 5's combined line grew past
that and recorded ``parsed: null`` (VERDICT r5 #1). New columns go on
their own line/file; the driver-facing line stays fixed-format.

Each query is forced through the noop sink so the full plan executes
(count() would let Catalyst prune the projected columns).

Two timings per query: **cold** is the first execution in the session
(plan compilation + codegen JIT + every stage cache empty — the number
a fresh cluster pays), **warm** is best-of-N after that (steady state,
shared caches populated — the number a long-lived session pays).
Several plans share a keyed stage cache (operators/materialize.py), so
warm alone would partially be a cache statement; reporting both keeps
the 2x-of-baseline bound honest (VERDICT r4)."""

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

    # the first run per query is TIMED as the cold column (plan
    # compile + codegen JIT + empty stage caches); SPARK_GRAFT_BENCH_WARMUP=0
    # skips it and leaves the cold column absent
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    # best-of-N timed runs (default 3): single-run times on a shared
    # box carry ±20% scheduler/GC noise, and the xxhash64-heavy codegen
    # plans need 3-4 executions to reach JIT steady state (SCALE.md,
    # round 5) — the minimum of three post-warmup runs samples past the
    # convergence tail that best-of-2 kept landing on
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, builder in bench_queries().items():
        if warmup:
            # the cold column's contract is "every stage cache empty":
            # keyed stage caches are now SHARED across lanes (the
            # fan_out_narrow "documents" key), so without this clear an
            # earlier lane pre-fills a later lane's input cache and the
            # recorded cold silently measures warm-cache reads. Clearing
            # here keeps cold honest; the warm reps below repopulate.
            spark.catalog.clearCache()
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.time() - t0, 3)
        best = None
        for _ in range(reps):
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        cold_note = f" (cold {cold[name]}s)" if name in cold else ""
        print(f"# {name}: {timings[name]}s{cold_note}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    if cold:
        cold_out = {
            "metric": "bench_cold_total_sec",
            "value": round(sum(cold.values()), 3),
            "unit": "sec",
            "queries_cold": cold,
            "sf": sf,
        }
        # Preceding line + sidecar file, never the final line (the
        # driver's tail capture is ~2 KB and parses only the last line).
        print(json.dumps(cold_out))
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_cold.json"), "w") as f:
                json.dump(cold_out, f)
        except OSError:
            pass
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    line = json.dumps(out)
    # The driver captures only the TAIL of stdout (~2 KB) and parses
    # the last line; round 5's combined line outgrew that and recorded
    # parsed:null. The final line grows with every bench=True query,
    # so warn well before the cliff (ADVICE r6 #3).
    if len(line) > 1536:
        print(
            f"WARNING: bench line is {len(line)}B (driver tail capture ~2KB); "
            "move per-query timings off the final line before adding more "
            "bench queries",
            file=sys.stderr,
        )
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

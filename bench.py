"""Headline benchmark: runs every bench-tagged registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The FINAL stdout line is a COMPACT object
the driver parses — per the declared driver contract it carries the
per-lane warm map:

    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "sf": 0.1, "lanes": 61, "queries": {"name": 0.35, ...}}

Round 5 learned that a FULL-precision combined line outgrows the
driver's ~2 KB tail capture and records ``parsed: null`` (VERDICT r5
#1); rounds 7-11 kept the map on a preceding line instead, which left
the driver unable to compare per-query round-over-round (PERF_r11
per_query: {}, VERDICT r11 #2). The resolution: the final line folds
the map back in at 2-DECIMAL precision with compact separators
(61 lanes ≈ 1.86 KB < 2 KB) behind an explicit byte-budget guard that
degrades precision rather than overflowing; full 3-decimal values
stay on their own preceding line and in the ``bench_cold.json``
sidecar. Existing queries are never removed or renamed.

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


# Lanes with a STANDING isolation record (VERDICT r8 #2): re-measured
# in isolation at the end of every recorded run regardless of ratios,
# because they have flagged as JIT-neighborhood-sensitive in three
# consecutive rounds while their isolated numbers sat at baseline.
STANDING_ISOLATION = ("bigram_perplexity_docs_fast", "bigram_perplexity_docs_bcast")


def _calibration_probe(spark) -> float:
    """Fixed, DATA-INDEPENDENT box-speed probe (VERDICT r8 #2): a
    canned xxhash64 aggregation over an in-memory range — no parquet,
    no stage caches, same plan every round — timed before any lane so
    round-over-round ratios can be normalized by box weather
    (BENCH_r08 baked ~15% of a slow-window into the driver record).
    Best-of-3 after one untimed JIT warmup; tools/cold_report.py
    divides lane ratios by the calibration ratio when both sidecars
    carry one."""
    import time as _t

    def run() -> float:
        # one wide codegen pass + one reduce: hash 67M longs, sum the
        # residues (raw hash sum overflows long under ANSI mode)
        t0 = _t.time()
        spark.range(0, 1 << 26, 1, 32).selectExpr(
            "sum(xxhash64(id, id * 31) % 1000000) AS s"
        ).write.format("noop").mode("overwrite").save()
        return _t.time() - t0

    run()  # untimed JIT warmup
    return round(min(run() for _ in range(3)), 3)


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

    calibration = _calibration_probe(spark)
    print(f"# calibration probe: {calibration}s", file=sys.stderr)

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

    # A/B knob (SCALE.md round-8 warm A/B): "1" restores the pre-r7
    # semantics where a lane's cold rep rides caches earlier lanes
    # built. NEVER set for recorded benches — cold stops meaning cold.
    keepcache = os.environ.get("SPARK_GRAFT_BENCH_KEEPCACHE", "0") == "1"

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
            if not keepcache:
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

    # Isolation re-measures (VERDICT r8 #2): lanes whose warm number
    # regressed >1.5x vs the committed sidecar — plus the standing set
    # — get one clean re-measure AFTER the full sweep, when the JIT
    # neighborhood has settled; a flagged lane whose isolated number
    # sits at baseline is box/JIT weather, not a plan change.
    isolation: dict[str, float] = {}
    if warmup and not keepcache:
        flagged = set(n for n in STANDING_ISOLATION if n in timings)
        try:
            import subprocess

            head_sidecar = json.loads(subprocess.run(
                ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
                 "show", "HEAD:bench_cold.json"],
                capture_output=True, text=True, check=True,
            ).stdout)
            head = head_sidecar.get("queries_warm", {})
            # Calibrate the regression ratio by relative box speed
            # (ADVICE r9 #4): divide t/head by calibration/head_cal so
            # in-run flagging matches cold_report.py's normalized
            # judgment — a uniformly slow box window no longer flags
            # every lane into extra isolation reps.
            head_cal = head_sidecar.get("calibration_sec") or 0.0
            box = (calibration / head_cal) if (calibration and head_cal) else 1.0
            flagged |= {
                n for n, t in timings.items()
                if n in head and head[n] > 0 and (t / head[n]) / box > 1.5
                and max(t, head[n]) > 0.3
            }
        except Exception:  # noqa: BLE001 — no git/HEAD sidecar: standing set only
            pass
        builders = bench_queries()
        for name in sorted(flagged):
            spark.catalog.clearCache()
            builders[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = None
            for _ in range(reps):
                t0 = time.time()
                builders[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            isolation[name] = round(best, 3)
            print(f"# isolation {name}: {isolation[name]}s (sweep {timings[name]}s)",
                  file=sys.stderr)

    sidecar = {
        "metric": "bench_cold_total_sec",
        "value": round(sum(cold.values()), 3) if cold else None,
        "unit": "sec",
        "calibration_sec": calibration,
        "isolation_warm": isolation,
        "queries_cold": cold,
        # warm per-lane map rides the same sidecar so
        # tools/cold_report.py can diff BOTH columns round-over-round
        # (VERDICT r7 #3; r7's clearCache-per-lane change made warm
        # comparisons meaningful for the first time)
        "queries_warm": timings,
        "warm_total_sec": total,
        "sf": sf,
    }
    if cold:
        # Preceding line, never the final line (the driver's tail
        # capture is ~2 KB and parses only the last line).
        print(json.dumps({k: v for k, v in sidecar.items()
                          if k not in ("queries_warm", "warm_total_sec")}))
    # the sidecar is the round-over-round regression BASELINE
    # (tools/cold_report.py): only a recorded-semantics run may refresh
    # it — a no-warmup run has no cold column, a keepcache A/B cell
    # has cache-riding (dishonest) cold values, and a fan-out-off A/B
    # cell (SPARK_GRAFT_FANOUT=0) times plans the recorded bench never
    # runs; any of them would clobber the baseline and turn the >1.5x
    # gate vacuous
    fanout_off = os.environ.get("SPARK_GRAFT_FANOUT", "1") == "0"
    if cold and not keepcache and not fanout_off:
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_cold.json"), "w") as f:
                json.dump(sidecar, f)
        except OSError:
            pass
    # Full-precision warm map on its OWN line (3 decimals, ascending by
    # time) for humans/logs; the DRIVER-facing copy now rides the final
    # line below (VERDICT r11 #2) — this one is allowed to fall out of
    # the tail capture because the sidecar carries the same values.
    warm_line = json.dumps(
        {
            "metric": "bench_queries_warm_sec",
            "queries": dict(sorted(timings.items(), key=lambda kv: kv[1])),
            "sf": sf,
        }
    )
    print(warm_line)
    # box-speed probe + isolated re-measures immediately before the
    # final line so they stay inside whatever tail budget the final
    # line leaves over (~20 B — calibration_sec is also in the sidecar)
    print(json.dumps(
        {"metric": "bench_meta", "calibration_sec": calibration,
         "isolation_warm": isolation}
    ))
    # FINAL line: the declared driver contract is ONE JSON line
    # {"metric", "value", "unit", "queries": {name: sec}, "sf"} — round
    # 11's layout kept the per-lane map on a preceding line and the
    # driver recorded per_query: {} / n_common: 0 (PERF_r11.json), so
    # round-over-round per-lane comparison was impossible (VERDICT r11
    # #2). Folded back in COMPACTLY: 2-decimal values, ascending by
    # time, compact separators — 61 lanes ≈ 1.86 KB, inside the ~2 KB
    # tail capture that round 5's full-precision combined line blew
    # (VERDICT r5 #1). Budget-guarded: if the line ever outgrows
    # 1985 B (the capture is 2000 B), values >= 1 s degrade to 1
    # decimal before any precision is taken from the sub-second lanes,
    # and the overflow is warned loudly. Measurement semantics are
    # unchanged — same timings dict, the full 3-decimal values stay on
    # the warm line above and in bench_cold.json.
    line = None
    for degrade in (None, 10.0, 1.0, 0.0):
        q = {
            k: (round(v, 1) if degrade is not None and v >= degrade else round(v, 2))
            for k, v in sorted(timings.items(), key=lambda kv: kv[1])
        }
        out = {
            "metric": "bench_total_sec",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "lanes": len(timings),
            "queries": q,
        }
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= 1985:
            break
    if len(line) > 1985:
        print(
            f"WARNING: final line {len(line)}B exceeds the ~2KB driver tail "
            "capture even at 1-decimal precision; the parsed line will clip — "
            "shrink the queries map",
            file=sys.stderr,
        )
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Runtime duplicate-scan audit: flags queries that re-read a table.

Executes every registered query (or a named subset) at a small scale
factor and counts distinct FileScan locations in the EXECUTED plan —
pre-execution plans hide AQE's runtime exchange reuse, and plan text
under a cached/checkpointed relation never executes, so only the
post-action plan tells the truth about scan work.

A query scanning one table N>=2 times is not automatically wrong:
per-branch FILTERED scans (funnel stages), explode outputs whose
materialization would cost more than a re-scan (threshold sweeps),
and deliberately-modeled snapshots (incremental maintenance) all
legitimately re-read. The audit exists so every such case is a
DECISION — the round-3 sweep of this report found six queries paying
2-6 hidden replays of whole aggregate/window stages (fixed via
row-local explode, pivot, or a localCheckpoint of the shared narrow
subtree; see SCALE.md).

Usage:
    python tools/scan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("scan-audit")
    flagged = 0
    for name, builder in query_map().items():
        if only and name not in only:
            continue
        try:
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            continue
        finally:
            spark.catalog.clearCache()
        locs = re.findall(r"Location: InMemoryFileIndex[^\[]*\[([^\]]+)\]", plan)
        c = Counter(loc.rsplit("/", 1)[-1].split(",")[0] for loc in locs)
        dups = {t: n for t, n in c.items() if n >= 2}
        if dups:
            flagged += 1
            print(f"multi  {name}: {dups}")
    print(f"{flagged} queries with repeated scans of one table")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Fleet-wide dropped-hint audit.

Spark drops a join hint silently (log-only) when the requested
strategy is illegal for the join type — the classic case is
broadcasting the PRESERVED side of an outer join, which degrades the
join to a full shuffle without failing anything. Hint resolution
happens during analysis/optimization, so this audit never executes a
query: it builds every registered plan, forces optimization, and
greps the captured log for HintErrorLogger warnings.

Usage:
    python tools/hint_audit.py [sf_dir] 2> /tmp/hints.err
    grep -c HintErrorLogger /tmp/hints.err   # 0 == clean fleet

Last clean run: round 3, after the countmin estimate fix
(operators/countmin.py — the one dropped hint the first audit found).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark()
    n_err = 0
    for name, fn in query_map().items():
        try:
            df = fn(spark, sf_dir)
            df._jdf.queryExecution().optimizedPlan()  # hints resolve (and drop) here
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            n_err += 1
            print(f"{name}: BUILD-ERR {ex!r:.120}", flush=True)
    print(f"optimized {len(query_map())} plans, {n_err} build errors")
    print("now grep this run's stderr for HintErrorLogger; 0 hits == clean")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())

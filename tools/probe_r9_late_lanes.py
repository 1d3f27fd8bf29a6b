"""Measured 10x/100x scale probes for the late-round-9 lanes
(SCALE.md): the incremental-dedup production tier and margin-based
NN mining, against the RI-preserving replicas (tools/make_replica.py).
Reports wall time (best of 2 warm) + output rows per scale so
SCALE.md's posture claims stay reproducible.

Expected shapes:
- incremental_dedup_verdicts_docs_fast: FLAT at these sizes (the
  day-batch plan is overhead-dominated — xxhash64 signatures are a
  codegen'd pure map and both probes are keyed equi-joins bounded by
  match density).
- margin_knn_mining_embeddings: ~linear in the TARGET corpus (the
  probe side is fixed-size, so the scored pass is |X| x n), with the
  mined-pair count bounded by the probe.

Usage:
    python tools/probe_r9_late_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANES = (
    "incremental_dedup_verdicts_docs_fast",
    "margin_knn_mining_embeddings",
)


def main() -> int:
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("probe_r9_late_lanes")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
    q = query_map()
    for sf_dir in dirs:
        for lane in LANES:
            best, rows = None, None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                rows = q[lane](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"{os.path.basename(sf_dir):>8} {lane:<38} {best:7.2f}s rows={rows}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Measured 10x/100x scale probes for the late-round-8 lanes
(SCALE.md): dup_span_detection_docs, dsir_importance_resample,
kcenter_coreset_embeddings against the RI-preserving replicas
(tools/make_replica.py). Reports wall time (best of 2 warm) + output
rows per scale so SCALE.md's posture claims are measurements.

Note the replica corpus is deliberately the dup-HEAVY worst case for
dup_span: replicas append a variation token at the END of each doc,
so every interior n-gram recurs across replicas and every position
survives the document-frequency screen — the island window then sees
O(total positions), its upper bound.

Usage:
    python tools/probe_r8_late_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANES = (
    "dup_span_detection_docs",
    "dup_span_detection_docs_fast",
    "dsir_importance_resample",
    "kcenter_coreset_embeddings",
    "bpe_train_merges_docs",
)


def main() -> int:
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("probe_r8_late_lanes")
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
            print(f"{os.path.basename(sf_dir):>8} {lane:<32} {best:7.2f}s rows={rows}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

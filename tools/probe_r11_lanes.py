"""Measured 10x/100x scale probes for the round-11 lanes (SCALE.md):
eval-set decontamination and the unigram-LM train trajectory, against
the RI-preserving replicas (tools/make_replica.py). Best-of-2 warm,
clearCache per run.

Expected shapes:
- decontaminate_eval_docs: ~linear in corpus tokens — the benchmark
  side is fixed-size and broadcast, the corpus side is one pure-map
  n-gram pass plus a column-pruned id pass; hit aggregation is
  match-grain. Replicas multiply the corpus but NOT the benchmark
  (probe ids live in the base id range), the production shape: a
  growing corpus screened against a fixed eval suite.
- unigram_lm_train_docs: the Viterbi E-step runs per DISTINCT word
  form (Heaps'-law sublinear — the word-soup vocabulary saturates
  almost immediately, so form count is ~flat across replicas) over a
  corpus-linear forms aggregate; expect near-flat wall dominated by
  the token count + M-step aggregates.

Usage:
    python tools/probe_r11_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANES = (
    "decontaminate_eval_docs",
    "unigram_lm_train_docs",
)


def main() -> int:
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("probe_r11_lanes")
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
            print(
                f"{os.path.basename(sf_dir):>8} {lane:<28} {best:7.2f}s rows={rows}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

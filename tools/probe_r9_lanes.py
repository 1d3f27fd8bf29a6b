"""Measured 10x/100x scale probes for the round-9 lanes (SCALE.md):
the WordPiece tokenizer pair (train + greedy encode) and the native
lossless-WebP decode lane, against the RI-preserving replicas
(tools/make_replica.py). Reports wall time (best of 2 warm) + output
rows per scale so SCALE.md's posture claims are measurements.

Expected shapes:
- wordpiece_train_merges_docs: like bpe_train — rounds ride the
  Heaps'-law vocabulary, so 10x->100x should be near-FLAT (the
  replica corpus multiplies occurrences, with per-replica variation
  tokens adding only slowly-growing new forms).
- wordpiece_encode_docs: encode once per FORM + one occurrence join —
  should scale like bpe_encode (sublinear in docs until the join
  dominates, then ~linear).
- media_webp_pixel_stats: fixture-count-bound pure-map decode; the
  probe is scale-INVARIANT by design (same 100 images at any sf) and
  serves as the no-exchange control row.

Usage:
    python tools/probe_r9_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANES = (
    "wordpiece_train_merges_docs",
    "wordpiece_encode_docs",
    "media_webp_pixel_stats",
)


def main() -> int:
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("probe_r9_lanes")
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

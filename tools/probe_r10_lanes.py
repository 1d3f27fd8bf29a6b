"""Measured 10x/100x scale probes for the round-10 lanes (SCALE.md):
CDC chunk dedup, the edit-distance-verified near-dup fast tier,
Kneser-Ney trigram scoring, and the native progressive-JPEG decode
lane, against the RI-preserving replicas (tools/make_replica.py).
Reports wall time (best of 2 warm) + output rows per scale so
SCALE.md's posture claims stay reproducible.

Expected shapes:
- cdc_chunk_dedup_fast: ~linear in corpus chars (the boundary pass is
  one vectorized convolve per doc inside mapInPandas; the only
  exchange is the chunk-fp rollup, ~n_chars/32 small rows).
- editdist_verified_near_dup_fast: linear signatures/banding, but the
  verify stage — and the OUTPUT itself — is quadratic in duplicate-
  cluster size: the replicas make every base doc a ~0.99-similar
  near-dup of its N-1 copies (the variation token shifts only a
  couple of shingles), so N-fold replication yields ~C(N,2) verified
  pairs per base doc. Measured: 477 pairs / 2.0s at 1x -> 279,228
  pairs / 159s at 10x. That is the real production hazard of
  materializing all pairs inside a duplicate cluster; the mitigations
  are cluster canonicalization (connected components + keep-one, the
  dedup_clusters/near_dedup_keep_best shape) instead of all-pairs
  output, or a per-bucket candidate cap (the df-cap pattern in
  operators/dedup.py). Excluded at 100x — the ~25M-pair verify is
  the hazard demonstrated, not a useful measurement (same posture as
  the khop oracle exclusion).
- kneser_ney_trigram_docs: ~linear in trigram positions; the model
  tables are vocab-bounded (the word-soup vocab saturates, so model
  joins stay tiny while the scoring stream scales).
- media_jpeg_progressive_pixel_stats: FLAT (fixture-generated ids,
  corpus-size independent) — probed only to pin the decode cost.

Usage:
    python tools/probe_r10_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANES = (
    # the PRODUCTION CDC tier (numpy mapInPandas; the relational HOF
    # reference measured 5.6s/42.8s at 1x/10x before being excluded —
    # its ~3 us/char interpreted-fold cost is the documented reason
    # the fast tier exists and holds the bench slot)
    "cdc_chunk_dedup_fast",
    "editdist_verified_near_dup_fast",
    "kneser_ney_trigram_docs",
    "media_jpeg_progressive_pixel_stats",
)


def main() -> int:
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("probe_r10_lanes")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
    q = query_map()
    for sf_dir in dirs:
        for lane in LANES:
            if lane == "editdist_verified_near_dup_fast" and sf_dir.endswith("sf10"):
                print(f"{os.path.basename(sf_dir):>8} {lane:<38} skipped "
                      "(cluster-quadratic pair output; see module docstring)",
                      flush=True)
                continue
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

"""Measured 10x/100x scale probes for the late-round-11 lanes
(SCALE.md): the suffix-array pair, the Bloom prefilter and the HTML
extraction gate, against the RI-preserving replicas
(tools/make_replica.py). Best-of-2 warm, clearCache per run.

Expected shapes:
- suffix_array_words_docs: linear in word-start positions — one
  pure-map explode plus ONE range exchange of (doc_id, pos, key32)
  rows; the two-pass dense rank's offsets pass is P rows regardless
  of scale.
- suffix_array_docs (char-grain doubling): linear in characters x 5
  fixed rounds; each round is a hash self-join plus a range exchange
  plus an eager localCheckpoint barrier. The barrier cost is why the
  word-grain direct-sort tier holds the bench slot; this probe prices
  it honestly.
- bloom_prefilter_incremental_docs: linear — the filter build is one
  distinct over 3 x n_hist bits, the probe side is a pure-map explode
  joined against the (broadcast) bit table, and the exact verify sees
  only maybes. The bit table grows with n_hist (~1 byte/doc as a
  bitmap, 8 B/set-bit relationally): at 100x it is ~1.3M rows /
  ~10 MB broadcast — past an executor's comfort the same plan runs
  with the bit join shuffled on `bit` (the hint is the only change).
- html_extract_main_docs: pure map, zero pre-output exchanges on the
  fanned-out scan; linear in corpus bytes.

Usage:
    python tools/probe_r11b_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LANES = (
    "suffix_array_words_docs",
    "bloom_prefilter_incremental_docs",
    "html_extract_main_docs",
    # priced last: the doubling construction's checkpoint barriers
    # make it the slowest lane in the probe at 100x
    "suffix_array_docs",
)


def main() -> int:
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("probe_r11b_lanes")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
    q = query_map()
    for sf_dir in dirs:
        for lane in LANES:
            # noop sink, NOT .count(): count() lets Catalyst prune a
            # map-only lane's entire projection (html_extract timed
            # 0.38 s at 100x under count — it was counting scan rows)
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                q[lane](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(
                f"{os.path.basename(sf_dir):>8} {lane:<34} {best:7.2f}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

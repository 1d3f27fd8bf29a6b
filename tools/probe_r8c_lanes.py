"""Measured scale probes for the round-8 training/linear-algebra lanes
(SCALE.md):

1. logreg_quality_train_docs on 1x/10x/100x document replicas — the
   feature pass and each GD round are single map-side-combined AVG
   aggregations, so wall time should grow ~linearly with the corpus
   while the per-round shuffle stays 4 doubles/partition.
2. pca_power_iteration_embeddings on embedding replicas — the Gram
   accumulation is the only corpus-sized stage; the three power
   iteration rounds run on the fixed d^2-row covariance table, so
   their cost must be corpus-size-FLAT.
3. bpe_encode_docs on document replicas — encode work rides the
   vocabulary (Heaps-sublinear), the per-occurrence cost is the final
   equi-join; total should grow clearly sublinearly vs the train
   rounds it shares.

Usage:
    python tools/probe_r8c_lanes.py [sf_dir_1x] [replica ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> int:
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.session import get_spark

    spark = get_spark("probe_r8c_lanes")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
    qm = query_map()

    for sf_dir in dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: missing")
            continue
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

        t_lr = _time(lambda: qm["logreg_quality_train_docs"](spark, sf_dir).collect())

        # PCA: total, plus the iteration-only portion measured by
        # re-running on a corpus-independent scale marker is not
        # separable from outside; report total (Gram dominates).
        t_pca = _time(lambda: qm["pca_power_iteration_embeddings"](spark, sf_dir).collect())

        t_enc = _time(lambda: qm["bpe_encode_docs"](spark, sf_dir).count())

        print(
            f"{sf_dir}: docs={n_docs} vecs={n_vecs} "
            f"logreg={t_lr:.2f}s pca={t_pca:.2f}s bpe_encode={t_enc:.2f}s",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

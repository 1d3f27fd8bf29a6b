"""HLL sketch contracts: accuracy envelope, mergeability, persistence.

These pin what the rows-only registry entries (`hll_daily_users`,
`hll_rollup_total_users`) can't check against DuckDB: the estimate
must sit within the published HLL error envelope of the exact count,
union-of-partials must equal sketching the union directly (the whole
point of persisting partials at 100 TB), and the binary sketch column
must survive a parquet round-trip so rollups can be incremental.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_orders_spark.plans.sketch_queries import (
    hll_daily_users,
    hll_rollup_total_users,
)
from etl_orders_spark.sources.readers import load_table

# lgK=12 -> relative standard error ~0.81%/sqrt(2^12)*... published RSE is
# 1.04/sqrt(2^lgK) ~= 1.6%; 5 sigma gives a deterministic-safe 8.2% bound.
_REL_TOL = 0.082


def test_daily_estimates_within_envelope(spark, sf_dir):
    rows = hll_daily_users(spark, sf_dir).collect()
    assert rows, "events table produced no days"
    for r in rows:
        assert r.est_users > 0
        assert abs(r.est_users - r.exact_users) <= max(3, _REL_TOL * r.exact_users), (
            f"day {r.day}: est {r.est_users} vs exact {r.exact_users}"
        )


def test_union_of_partials_equals_direct_sketch(spark, sf_dir):
    row = hll_rollup_total_users(spark, sf_dir).collect()[0]
    # HLL union is lossless at equal lgK: merging per-day partials must give
    # the same estimate as sketching the full column in one pass.
    assert row.est_merged == row.est_direct
    assert abs(row.est_merged - row.exact_total) <= max(3, _REL_TOL * row.exact_total)


def test_sketch_column_roundtrips_through_parquet(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), F.col("user_id").cast("string").alias("uid")
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("uid", F.lit(12)).alias("sk"))
    path = str(tmp_path / "daily_sketches")
    daily.write.mode("overwrite").parquet(path)

    # merge the PERSISTED partials (what an incremental rollup reads back)
    est_persisted = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("e"))
        .collect()[0]
        .e
    )
    est_live = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("uid", F.lit(12))).cast("long").alias("e"))
        .collect()[0]
        .e
    )
    assert est_persisted == est_live


def test_hyperanf_khop_tracks_exact_reach(spark, sf_dir):
    """HyperANF twin vs exact k-hop: the sketch estimates must sit
    within the HLL error envelope of the exact cumulative counts —
    per landmark ≤ the 5-sigma bound, and ≤5% mean absolute relative
    error fleet-wide at every hop depth. This is the correctness
    contract for the rows-only `khop_reachability_sketch` entry."""
    from etl_orders_spark.plans.registry import query_map

    q = query_map()
    exact = {r.partkey: r for r in q["khop_reachability_parts"](spark, sf_dir).collect()}
    est = {r.partkey: r for r in q["khop_reachability_sketch"](spark, sf_dir).collect()}
    assert set(est) == set(exact), "landmark sample mismatch"
    # hyperanf defaults to lgK=10 (the measured accuracy/merge-cost
    # knee: mean err ~2.6% at sf0.01 vs ~8% at lgK=9, and each merge
    # is 4x cheaper than lgK=12): RSE = 1.04/sqrt(2^10) ~= 3.3%,
    # 5 sigma -> 16.3% per-landmark bound
    anf_tol = 0.163
    for hop in (1, 2, 3):
        rel_errs = []
        for pk, e in exact.items():
            truth = e[f"n_{hop}hop"]
            guess = est[pk][f"n_{hop}hop_est"]
            if truth == 0:
                assert guess == 0, f"part {pk} hop {hop}: est {guess} vs exact 0"
                continue
            assert abs(guess - truth) <= max(3, anf_tol * truth), (
                f"part {pk} hop {hop}: est {guess} vs exact {truth}"
            )
            rel_errs.append(abs(guess - truth) / truth)
        assert rel_errs and sum(rel_errs) / len(rel_errs) <= 0.05


def test_hll_overlap_within_compound_envelope(spark, sf_dir):
    """Inclusion-exclusion compounds three estimates, so the error
    envelope scales with the UNION size, not the intersection: pin
    |est − exact| ≤ 3·RSE·est_union (plus a small absolute floor for
    sparse-mode jitter) for every event-type pair."""
    from etl_orders_spark.plans.sketch_queries import hll_event_type_overlap

    rows = hll_event_type_overlap(spark, sf_dir).collect()
    assert rows, "no event-type pairs"
    for r in rows:
        bound = max(5, 3 * 0.0163 * r.est_union)
        assert abs(r.est_overlap - r.exact_overlap) <= bound, (
            f"{r.type_a}x{r.type_b}: est {r.est_overlap} vs exact {r.exact_overlap}"
            f" (union {r.est_union})"
        )

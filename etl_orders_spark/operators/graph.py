"""Graph operators for dedup post-processing.

A pair-generating dedup operator (MinHash-LSH, SimHash, n-gram
Jaccard) emits EDGES; the actual dedup decision needs the connected
COMPONENT of each document — transitive duplicates (a~b, b~c) must
collapse into one cluster even when a and c never pair directly.

`connected_components` is iterative min-label propagation with path
halving (each vertex also adopts its current label's label), so
convergence is O(log diameter) joins rather than O(diameter) — the
Hash-to-Min family (Rastogi et al., ICDE'13). Per iteration the only
shuffles are keyed joins on vertex id; labels monotonically decrease,
so a stable checksum means a reached fixpoint, and lineage is
truncated every round with localCheckpoint so the plan doesn't grow
with the iteration count. At 100 TB the same loop runs with the label
table staged to parquet per round; duplicate clusters have tiny
diameters (chains only as long as the near-dup chain itself), so the
loop count stays single-digit.

The reference has no graph surface; this generalizes its dedup-less
full-refresh loads (SURVEY.md §2 ABSENT rows) to the cluster step a
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hyperanf_reach(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    hops: int = 3,
    lg_k: int = 10,
) -> DataFrame:
    """Approximate cumulative k-hop reach per node via HyperANF
    (Boldi-Rosa-Vigna, WWW'11): each node carries a mergeable HLL
    sketch of the vertex set it reaches in ≤ t hops, and one round is

        state[t+1](v) = state[t](v) ∪ ⋃_{(v,u)∈E} state[t](u)

    — a single keyed join (edges ⋈ state on the neighbor id) plus an
    `hll_union_agg` group-by per round. This is the scale form of
    exact bounded reachability: per-node state is a fixed-size sketch
    (2^lg_k registers) instead of the frontier pair set, so total
    state is |V| × sketch bytes no matter how dense the graph — the
    exact form's (source, reached) pairs grow toward |V|² on dense
    co-purchase graphs (see `khop_reachability_parts`, whose 3-hop
    expansion dominates its runtime).

    Output: node (long), est_1hop .. est_{hops}hop (long) — estimated
    neighborhood sizes EXCLUDING self (estimate − 1, mirroring the
    exact query's `dst != src`). Standard error ≈ 1.04/√2^lg_k —
    lg_k=10 is the measured accuracy/merge-cost knee (≈3.3% RSE,
    mean observed error ~2.6% at sf0.01; lg_k=9 degrades to ~8%
    while each merge costs 4× less than lg_k=12 — per-hop work is
    O(|E| · 2^lg_k) register-max bytes; exact in HLL sparse mode for
    small neighborhoods). Lineage is truncated every round (localCheckpoint)
    so the plan doesn't grow with the hop count; at 100 TB the state
    table stages to parquet per round instead.

    Memory discipline (what the 10x local probe caught): the per-hop
    join materializes one sketch per EDGE before the map-side
    `hll_union_agg` combine, so the working set is edge-partition x
    sketch bytes — the sketch-carrying side is spread over a floor of
    8 x defaultParallelism partitions to keep per-task union state
    bounded, each hop's estimates are extracted into a tiny (node,
    long) frame immediately, and the previous round's checkpointed
    state unpersists as soon as the next round materializes (only one
    |V| x sketch table is ever live).
    """
    par = edges.sparkSession.sparkContext.defaultParallelism * 8
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("_s"), F.col(dst_col).cast("long").alias("_d")
        )
        .distinct()
        .repartition(par, "_d")
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("_s").alias("_v")).union(e.select("_d")).distinct()
    # singleton sketches: nodes are distinct, so the group-by aggregates
    # exactly one element per sketch
    state = nodes.groupBy("_v").agg(
        F.hll_sketch_agg(F.col("_v").cast("string"), F.lit(lg_k)).alias("_sk")
    ).localCheckpoint(eager=True)
    ests = []
    for t in range(1, hops + 1):
        nbr = (
            e.join(state.select(F.col("_v").alias("_d"), "_sk").repartition(par, "_d"), "_d")
            .groupBy("_s")
            .agg(F.hll_union_agg("_sk", F.lit(False)).alias("_nsk"))
            .withColumnRenamed("_s", "_v")
        )
        new_state = (
            state.join(nbr, "_v", "left")
            .select(
                "_v",
                F.when(F.col("_nsk").isNull(), F.col("_sk"))
                .otherwise(F.hll_union("_sk", "_nsk"))
                .alias("_sk"),
            )
            .localCheckpoint(eager=True)
        )
        # note: DataFrame.unpersist does NOT free a localCheckpoint's
        # blocks (the checkpoint RDD is not in the cache manager) — old
        # rounds' sketch tables are reclaimed by the ContextCleaner
        # once this reference drops, so peak block storage can briefly
        # hold two |V|-row sketch tables, not one
        state.unpersist()
        state = new_state
        # extract the longs NOW so the sketch table can be dropped next
        # round — est frames are |V| x 16 bytes, not |V| x sketch
        ests.append(
            state.select(
                "_v",
                (F.hll_sketch_estimate("_sk") - F.lit(1))
                .cast("long")
                .alias(f"est_{t}hop"),
            ).localCheckpoint(eager=True)
        )
    out = ests[0]
    for nxt in ests[1:]:
        out = out.join(nxt, "_v")
    return out.withColumnRenamed("_v", "node")


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the MINIMUM vertex id reachable from it
    (undirected). Edge endpoints must be drawn from `vertices`.

    Output: id_col, component (long) — singletons label themselves.
    """
    sym = (
        edges.select(F.col(src_col).cast("long").alias("_s"), F.col(dst_col).cast("long").alias("_d"))
        .union(edges.select(F.col(dst_col).cast("long").alias("_s"), F.col(src_col).cast("long").alias("_d")))
        .distinct()
        # edges are consumed once per round: materialize them eagerly or the
        # whole upstream pair-generation plan (e.g. MinHash-LSH) re-executes
        # every iteration; at 100 TB this is the stage-to-parquet handoff
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col(id_col).cast("long").alias("_v"), F.col(id_col).cast("long").alias("_lbl")
    ).localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_iter):
        # labels only ever decrease, so a stable sum IS the fixpoint
        cur_sum = labels.agg(F.sum("_lbl")).first()[0]
        if cur_sum == prev_sum:
            return labels.select(F.col("_v").alias(id_col), F.col("_lbl").alias("component"))
        prev_sum = cur_sum
        nbr_min = (
            sym.join(labels.select(F.col("_v").alias("_d"), "_lbl"), "_d")
            .groupBy("_s")
            .agg(F.min("_lbl").alias("_nmin"))
            .withColumnRenamed("_s", "_v")
        )
        stepped = labels.join(nbr_min, "_v", "left").select(
            "_v", F.least("_lbl", F.coalesce("_nmin", "_lbl")).alias("_lbl")
        )
        # path halving: also adopt the current label's own label,
        # collapsing chains in O(log diameter) rounds
        halved = stepped.join(
            labels.select(F.col("_v").alias("_lbl"), F.col("_lbl").alias("_lbl2")),
            "_lbl",
            "left",
        ).select("_v", F.least("_lbl", F.coalesce("_lbl2", "_lbl")).alias("_lbl"))
        labels = halved.localCheckpoint(eager=True)
    # the loop checks stability at the TOP, so a graph that reaches its
    # fixpoint exactly on the final update would otherwise be reported
    # as non-converged with the correct answer in hand
    if labels.agg(F.sum("_lbl")).first()[0] == prev_sum:
        return labels.select(F.col("_v").alias(id_col), F.col("_lbl").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")

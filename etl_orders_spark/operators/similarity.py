"""Similarity search over embedding columns (north-star set).

Two tiers:
- `brute_force_topk`: exact cosine top-k. The query set broadcasts;
  the corpus streams through map-side — no shuffle of the corpus, one
  window top-k over (query, candidate) scores. Exact, O(|Q|·|C|):
  right for small query batches or as the verifier/baseline.
- `lsh_bucketed_topk`: random-hyperplane LSH (SimHash for vectors).
  Each vector maps to a bit-bucket; only same-bucket pairs score.
  Sub-linear candidate sets at the cost of recall; multiple hash
  tables (`num_tables`) trade compute back for recall. This is the
  100 TB path: bucket ids shuffle, vectors join within buckets.

Embedding math is `zip_with`/`aggregate` (JVM, codegen) — see
functions/vectors.py. No Python UDF anywhere.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_orders_spark.operators.rank import one_bucket
from etl_orders_spark.operators.topk import topk_per_group


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, cos (rounded 6; ties break by
    neighbor id so results are deterministic). Self-pairs excluded.
    """
    from etl_orders_spark.functions.vectors import cosine_batch

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_batch("q_vec", "c_vec"), 6).alias("cos"),
        )
    )
    return topk_per_group(scored, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k)


def _hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python PRNG —
    reproducible across machines, no numpy dependency in the plan)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(num_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def _bucket_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_planes: int,
    num_tables: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """All hash tables' bucket ids in ONE Arrow pass: the (tables·planes,
    dim) plane matrix multiplies each batch once, sign bits pack per
    table, and posexplode fans each row out to its `num_tables`
    (table, bucket) assignments.

    A per-plane Column-expression form (interpreted HOF dot per
    plane) would cost tables·planes evaluations per row — at 32+
    hashes that dwarfs the actual candidate scoring; this batch form
    is one GEMM.
    Output: _id, _vec, _table, _bucket."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [_hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)], dtype=np.float64
    ).reshape(num_tables * num_planes, dim)
    weights = (2 ** np.arange(num_planes)).astype(np.float64)

    @pandas_udf("array<long>")
    def bucket_ids(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(s.to_numpy()).astype(np.float64)
        bits = (m @ planes.T) >= 0  # (n, tables·planes)
        packed = bits.reshape(len(m), num_tables, num_planes).astype(np.float64) @ weights
        return pd.Series(list(packed.astype(np.int64)))

    return df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.posexplode(bucket_ids(F.col(vec_col))).alias("_table", "_bucket"),
    )


def _gemm_topk_cogrouped(
    queries: DataFrame,
    corpus: DataFrame,
    keys: list[str],
    k: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Per-group exact cosine top-k via one BLAS GEMM per cogroup.

    `queries` carries keys + (query_id, q_vec); `corpus` carries keys +
    (neighbor_id, c_vec). Both sides shuffle on the group keys once;
    inside each group the full cosine sub-matrix is one float64 matrix
    multiply in an Arrow batch, then each query keeps its k best
    candidates by (cos desc, neighbor_id asc) on the 6-rounded score.

    Why: per-pair `aggregate`/`zip_with` dots run on the JVM expression
    interpreter (HOFs don't codegen) — at 10⁶ candidate pairs that is
    minutes; the GEMM form is ~100× per pair and its memory is bounded
    by the group size, which the caller controls via bucketing. Local
    top-k per group then a global top-k merge is EXACT over the candidate
    union: a globally top-k candidate has <k better candidates in every
    group it shares with the query.

    The output id types mirror the input id columns (not hardcoded
    long), so string / int / long document ids all pass the Arrow
    boundary unchanged."""
    q_id_t = queries.schema["query_id"].dataType.simpleString()
    c_id_t = corpus.schema["neighbor_id"].dataType.simpleString()

    def score(qpdf, cpdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "query_id": np.array([], dtype=object),
                "neighbor_id": np.array([], dtype=object),
                "cos": np.array([], dtype=np.float64),
            }
        )
        if len(qpdf) == 0 or len(cpdf) == 0:
            return empty
        cpdf = cpdf.sort_values("neighbor_id")  # ties in the stable sort below → lower id
        qi = qpdf["query_id"].to_numpy()
        ci = cpdf["neighbor_id"].to_numpy()
        qm = np.vstack(qpdf["q_vec"].to_numpy()).astype(np.float64)
        cm = np.vstack(cpdf["c_vec"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(qm, axis=1)
        cn = np.linalg.norm(cm, axis=1)
        qz, cz = qn == 0.0, cn == 0.0
        qn[qz], cn[cz] = 1.0, 1.0
        sim = np.round((qm / qn[:, None]) @ (cm / cn[:, None]).T, 6)
        if qz.any() or cz.any():  # zero-norm convention: cos = 0
            sim[qz, :] = 0.0
            sim[:, cz] = 0.0
        if exclude_self:
            sim[qi[:, None] == ci[None, :]] = -np.inf
        kk = min(k, sim.shape[1])
        # candidates are id-ascending, so one stable row-wise argsort on
        # -cos yields (cos desc, neighbor_id asc) for every query at once
        idx = np.argsort(-sim, axis=1, kind="stable")[:, :kk]
        top_c = np.take_along_axis(sim, idx, axis=1).ravel()
        top_n = ci[idx].ravel()
        top_q = np.repeat(qi, kk)
        keep = np.isfinite(top_c)
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"query_id": top_q[keep], "neighbor_id": top_n[keep], "cos": top_c[keep]}
        )

    return (
        queries.groupBy(*keys)
        .cogroup(corpus.groupBy(*keys))
        .applyInPandas(score, f"query_id {q_id_t}, neighbor_id {c_id_t}, cos double")
    )


def _assign_nearest(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, n: int = 1, n_blocks: int = 32
) -> DataFrame:
    """Nearest-`n` centroid per vector (by cosine, ties to lower cluster
    id). The corpus hash-partitions into `n_blocks` blocks; the tiny
    centroid set replicates into every block (the relational analog of a
    broadcast), and each block scores with one GEMM — the corpus never
    shuffles on anything but its block id."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_blocks)).alias("_blk"),
    )
    c = centroids.select(
        F.col("cluster").cast("long").alias("neighbor_id"),
        F.col("cvec").alias("c_vec"),
        F.explode(F.array(*[F.lit(i) for i in range(n_blocks)])).alias("_blk"),
    )
    return _gemm_topk_cogrouped(v, c, ["_blk"], n, exclude_self=False).select(
        F.col("query_id").alias("_vid"),
        F.col("neighbor_id").cast("int").alias("cluster"),
        F.col("cos").alias("_cos"),
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    refine: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate all-pairs top-k: a coarse
    quantizer partitions the corpus into `n_centroids` cells; each
    query scores only vectors in its `nprobe` nearest cells.

    Deterministic construction: seed centroids are a stride sample of
    the corpus (no RNG), optionally refined by one relational Lloyd
    iteration (posexplode → per-dimension mean → rebuild). At scale
    this is the classic IVF layout — centroids broadcast, the corpus
    partitioned by cell id, probes shuffle only (cell, query) pairs.

    Output: query_id, neighbor_id, cos (rounded 6).
    """
    total = df.count()
    stride = max(total // n_centroids, 1)
    vecs = df.select(F.col(id_col).cast("long").alias("_vid"), F.col(vec_col).alias("_v"))
    # deterministic hash-stride sample (~n_centroids rows) — the window
    # numbering runs over the tiny sample only, never the full corpus
    sample = df.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")).filter(
        F.abs(F.xxhash64(F.col("_cid").cast("string"))) % stride == 0
    )
    seeds = (
        sample.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy(one_bucket("_cid")).orderBy("_cid")) - 1,
        )
        .filter(F.col("_rn") < n_centroids)
        .select(F.col("_rn").alias("cluster"), F.col("_cv").alias("cvec"))
    )
    if refine:
        assigned = _assign_nearest(df, seeds, id_col, vec_col, 1).join(vecs, "_vid")
        dims = assigned.select("cluster", F.posexplode("_v").alias("d", "x"))
        means = dims.groupBy("cluster", "d").agg(F.avg("x").alias("m"))
        seeds = (
            means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("_pairs"))
            .select(
                "cluster",
                F.transform("_pairs", lambda p: p["m"].cast("float")).alias("cvec"),
            )
        )
    # one assignment pass: every vector's nprobe nearest cells; its top-1
    # cell is its inverted-file home, so `cells` is a rank-1 filter of the
    # same result rather than a second scoring job
    near = _assign_nearest(df, seeds, id_col, vec_col, nprobe).localCheckpoint(eager=True)
    home = topk_per_group(near, ["_vid"], [F.desc("_cos"), F.asc("cluster")], 1)
    # toDF re-aliases every column (fresh exprIds) so the probes/cells
    # self-join out of the same assignment table isn't flagged ambiguous
    cells = (
        home.join(vecs, "_vid")
        .select("_vid", "_v", "cluster")
        .toDF("neighbor_id", "c_vec", "cluster")
    )
    probes = (
        near.join(vecs, "_vid")
        .select("_vid", "_v", "cluster")
        .toDF("query_id", "q_vec", "cluster")
    )
    scored = _gemm_topk_cogrouped(probes, cells, ["cluster"], k).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    return topk_per_group(scored, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k)


def near_dup_lsh_params(
    n: int,
    tau: float,
    target_bucket: int = 2048,
    miss_target: float = 1e-5,
) -> tuple[int, int]:
    """Corpus-size-aware (num_planes, num_tables) for the bucketed
    near-dup join.

    Fixed planes do not survive growth: bucket population is
    ~n/2^planes, and each bucket costs O(m²) in its GEMM, so a corpus
    100× larger needs ~log2(100) ≈ 7 more planes to keep per-bucket
    work constant. More planes cut a true pair's per-table collision
    probability p = (1-θ/π)^planes (θ = arccos τ, random-hyperplane
    LSH, Charikar STOC'02), so tables are recomputed from the target
    overall miss bound (1-p)^tables ≤ miss_target. Returned planes are
    clamped to [4, 24]; callers with a measured workload can always
    pin both knobs explicitly (the oracle-checked registered query
    does, for fixture-scale determinism).
    """
    theta = math.acos(max(-1.0, min(1.0, tau)))
    planes = max(4, min(24, math.ceil(math.log2(max(n, 1) / target_bucket)) if n > target_bucket else 4))
    p_table = (1.0 - theta / math.pi) ** planes
    if p_table >= 1.0:  # tau == 1 ⇒ every table collides
        return planes, 1
    tables = max(1, math.ceil(math.log(miss_target) / math.log(1.0 - p_table)))
    return planes, tables


def semdedup_k(n: int, floor_k: int = 4, cap: int = 65536) -> int:
    """Corpus-size-aware cluster count for SemDeDup (VERDICT r7 #2),
    mirroring what :func:`near_dup_lsh_params` does for the LSH family.

    A pinned K does not survive growth: mean cluster population is
    n/K and the within-cluster pair GEMM costs O(m²), so per-cluster
    work at fixed K grows QUADRATICALLY with the corpus (the r7 probe
    measured 52k-row clusters at 100× under the fixture's K=4).
    K = ceil(sqrt(n)) keeps the mean cluster at ~sqrt(n), so
    per-cluster GEMM work grows ~linearly in n and total pair work
    ~n^1.5 — the SemDeDup paper's own operating point (Abbas et al.
    2023 run ~50k clusters over ~100M-doc corpora, i.e. K scaled with
    corpus, clusters of a few thousand).

    ``cap`` bounds the centroid matrix a worker must hold for the
    vectorized assignment (65536 x dim doubles = 32 MB at dim 64); a
    corpus past cap² vectors (~4.3B) should shard centroids
    relationally (the `_assign_nearest` block-replicate pattern)
    instead of raising the cap. ``floor_k`` pins the fixture scale:
    the registered oracle lane uses an explicit K=4 and stays
    byte-stable regardless of this derivation."""
    return min(cap, max(floor_k, math.isqrt(max(n, 0) - 1) + 1 if n > 1 else floor_k))


def kmeans_assign_euclidean(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "np.ndarray",
    centroid_ids: "np.ndarray | None" = None,
) -> DataFrame:
    """Vectorized nearest-centroid assignment under the SemDeDup
    rounding contract: cid = argmin over ROUND(d², 6) with ties to the
    LOWEST cid — the exact contract the oracle-checked SQL twin
    (plans/vector_queries) expresses with ROW_NUMBER ORDER BY
    ROUND(d2, 6), cid; numpy's argmin returns the first minimum, which
    IS the lowest cid. d² expands to x·x − 2x·c + c·c, the same
    algebraic form both engines use (same dot products; BLAS
    k-reduction order can differ from a sequential fold in the last
    ulp — the pre-existing risk class every vector oracle here
    carries). The 6-digit rounding runs as floor(d2·1e6 + 0.5) integer
    micro-units, which IS Spark's HALF_UP ROUND for the nonnegative d²
    (np.round would be half-EVEN: a boundary value would tie here
    where the SQL twin separates — the ordering is all argmin uses, so
    the integer form needs no division back).

    The centroid matrix rides the task closure (bounded by
    :func:`semdedup_k`'s cap at ~32 MB); the corpus never shuffles —
    assignment is a pure Arrow-batched map, one GEMM per batch instead
    of the K-way crossJoin row explosion the fixture-scale SQL form
    pays (fine at K=4, hours at K=sqrt(n))."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    cmat = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    cnorm = (cmat * cmat).sum(axis=1)
    # a Lloyd pass can empty a cluster, leaving centroid rows whose
    # labels are no longer 0..K-1 dense: rows must be SORTED by label
    # so first-argmin still resolves ties to the lowest cid
    labels = (
        np.arange(cmat.shape[0], dtype=np.int64)
        if centroid_ids is None
        else np.asarray(centroid_ids, dtype=np.int64)
    )
    if (np.diff(labels) <= 0).any():
        raise ValueError("kmeans_assign_euclidean: centroid_ids must be strictly increasing")

    def _make():
        def cid_for(v: pd.Series) -> pd.Series:
            import numpy as np
            import pandas as pd

            x = np.vstack(v.to_numpy()).astype(np.float64)
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cmat.T) + cnorm[None, :]
            return pd.Series(labels[np.floor(d2 * 1e6 + 0.5).argmin(axis=1)])

        cid_for.__annotations__ = {"v": pd.Series, "return": pd.Series}
        return pandas_udf(cid_for, "long")

    return df.withColumn("cid", _make()(F.col(vec_col)))


def near_dup_pairs_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    dim: int = 64,
    num_planes: int | None = 4,
    num_tables: int | None = 16,
    seed: int = 7,
) -> DataFrame:
    """All pairs with cosine ≥ τ via LSH-bucketed candidates + exact
    rescore — the scale-safe form of the O(n²) all-pairs join (which
    plans a BroadcastNestedLoopJoin and dies at 100 TB).

    Miss probability for a true pair at cosine ≥ τ is
    (1-(1-θ/π)^planes)^tables with θ=arccos(τ): for τ=0.9,
    planes=4, tables=16 it is ~4e-6 — tight enough that the exact
    all-pairs oracle still matches; raise `num_tables` to push it
    further. Output: id_a < id_b, cos (rounded 6).

    Plan shape: one Arrow pass assigns all 16 bucket ids per vector,
    vectors shuffle once on (table, bucket), and each bucket computes
    its own cosine sub-matrix with a single GEMM, emitting only pairs
    ≥ τ — the candidate pair set is never materialized or shuffled, so
    the only wide exchanges are the bucket shuffle and the final
    (id_a, id_b) dedup of emitted pairs. Skew caveat at 100 TB: a
    degenerate bucket holding m vectors costs O(m²) in one task —
    raise `num_planes` (more, smaller buckets) and compensate with
    `num_tables` to keep recall.

    Pass ``num_planes=None`` to derive both knobs from the corpus
    size via :func:`near_dup_lsh_params` (one count() pre-pass):
    fixed planes make bucket population — and the per-bucket GEMM —
    grow linearly/quadratically with n, measured unusable at a 100×
    scale-up; auto mode holds per-bucket work constant instead.
    """
    if num_planes is None:
        num_planes, num_tables = near_dup_lsh_params(df.count(), tau)
    elif num_tables is None:
        raise ValueError("num_tables must be set when num_planes is pinned")
    buckets = _bucket_assign(df, id_col, vec_col, num_planes, num_tables, seed, dim)
    return (
        buckets.groupBy("_table", "_bucket")
        .applyInPandas(
            make_pair_emitter("_id", "_vec", tau), GROUP_PAIR_SCHEMA
        )
        .dropDuplicates(["id_a", "id_b"])
    )


# output schema of make_pair_emitter's kernels
GROUP_PAIR_SCHEMA = "id_a long, id_b long, cos double"


# row-block height for the within-group GEMM: peak per-task scratch is
# _PAIR_BLOCK_ROWS * m * 8 bytes (one sim block) instead of m*m*8 — a
# degenerate 52k-row group costs ~1.7 GB peak instead of ~21 GB
_PAIR_BLOCK_ROWS = 4096


def make_pair_emitter(id_field: str, vec_field: str, tau: float):
    """The within-group cosine-pair GEMM kernel, shared by every
    group-keyed near-dup path (LSH buckets in
    `near_dup_pairs_bucketed`, k-means clusters in
    plans/vector_queries.semantic_dedup_embeddings): sort by id,
    float64 GEMM over the group's unit vectors in ROW BLOCKS, emit
    upper-triangle pairs at cos >= tau. Blocking bounds peak task
    memory at blockrows x m doubles regardless of group size (a full
    m x m sim matrix is quadratic scratch — the 100x probe measured a
    52k-row cluster needing ~21 GB unblocked). The strips compute the
    same dot products under the same round-to-6 contract as the full
    multiply; BLAS may pick shape-dependent kernels whose k-reduction
    order differs in the last ulp (ADVICE r7), the same pre-existing
    numpy-vs-DuckDB risk class every vector oracle here already
    carries — fixture lanes verify green. The zero-norm -> cos 0
    convention, the float64 cast, and the round-to-6 contract the
    DuckDB oracles depend on live HERE, once — callers must not
    re-implement them."""
    tau_f = float(tau)

    def emit_pairs(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cos": np.array([], dtype=np.float64),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values(id_field)
        ids = pdf[id_field].to_numpy()
        mat = np.vstack(pdf[vec_field].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors -> cos 0 by convention
        unit = mat / norms[:, None]
        m = len(ids)
        out_a, out_b, out_c = [], [], []
        for r0 in range(0, m - 1, _PAIR_BLOCK_ROWS):
            r1 = min(r0 + _PAIR_BLOCK_ROWS, m)
            # rows r0..r1 against every LATER column (upper triangle)
            sim = np.round(unit[r0:r1] @ unit[r0 + 1 :].T, 6)
            # strictly-upper mask within the strip: column j (global
            # index r0+1+j) pairs with row i (global r0+i) iff j >= i
            iu, ju = np.nonzero(sim >= tau_f)
            keep = ju >= iu
            out_a.append(ids[r0 + iu[keep]])
            out_b.append(ids[r0 + 1 + ju[keep]])
            out_c.append(sim[iu[keep], ju[keep]])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return emit_pairs


def near_dup_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ τ via block-partitioned GEMM.

    The id space is hashed into `n_blocks` blocks; every unordered
    block pair (i ≤ j) becomes one task, and each task computes its
    full cosine sub-matrix with one BLAS matrix multiply inside an
    Arrow-batched `applyInPandas`. This keeps the exact O(n²) answer
    but moves the per-pair math from interpreted higher-order
    aggregates to vectorized float64 GEMM (~100× per pair), which is
    the classic distributed all-pairs-similarity layout: replication
    factor is `n_blocks` per row, peak task memory is two blocks of
    vectors, so at 100 TB you raise `n_blocks` until 2·(n/B)·dim·8
    bytes fits an executor and the job stays GEMM-bound. Prefer
    `near_dup_pairs_bucketed` when τ is high and the data is
    clusterable (LSH prunes candidates); prefer this when the answer
    must be exact or the embedding distribution defeats LSH pruning.

    Output: id_a < id_b, cos (rounded 6); zero-norm vectors score 0.
    """
    B = int(n_blocks)
    vecs = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(B)).cast("int").alias("_blk"),
    )
    # replicate each row into every task its block participates in:
    # block k joins tasks (min(k,j), max(k,j)) for j in 0..B-1
    tasks = F.array(
        *[
            F.struct(
                F.least(F.col("_blk"), F.lit(j)).alias("bi"),
                F.greatest(F.col("_blk"), F.lit(j)).alias("bj"),
            )
            for j in range(B)
        ]
    )
    tagged = (
        vecs.select("_id", "_v", "_blk", F.explode(F.array_distinct(tasks)).alias("_t"))
        .select("_id", "_v", "_blk", F.col("_t.bi").alias("_bi"), F.col("_t.bj").alias("_bj"))
    )
    tau_f = float(tau)

    def rescore(key, pdf):  # closure: pickled by value (no import-path dependency)
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cos": np.array([], dtype=np.float64),
            }
        )
        bi, bj = int(key[0]), int(key[1])
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy()
        mat = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors -> cos 0 by convention
        unit = mat / norms[:, None]
        if bi == bj:
            sim = unit @ unit.T
            iu, ju = np.triu_indices(len(ids), k=1)
            id_a, id_b, cos = ids[iu], ids[ju], sim[iu, ju]
        else:
            left = pdf["_blk"].to_numpy() == bi
            if not left.any() or left.all():
                return empty
            sim = unit[left] @ unit[~left].T
            la, rb = ids[left], ids[~left]
            id_a = np.repeat(la, len(rb))
            id_b = np.tile(rb, len(la))
            cos = sim.ravel()
        cos = np.round(cos, 6)
        keep = cos >= tau_f
        id_a, id_b, cos = id_a[keep], id_b[keep], cos[keep]
        return pd.DataFrame(
            {
                "id_a": np.minimum(id_a, id_b),
                "id_b": np.maximum(id_a, id_b),
                "cos": cos,
            }
        )

    return tagged.groupBy("_bi", "_bj").applyInPandas(rescore, "id_a long, id_b long, cos double")


def lsh_bucketed_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate all-pairs top-k: vectors meet only when some hash
    table buckets them together. Candidate pairs then score exactly.

    Output: query_id, neighbor_id, cos — the approximate top-k per
    vector. Recall measured against `brute_force_topk` in tests.
    """
    # both cogroup sides read the assignment table: materialize it once
    # or the Arrow bucket-id pass runs twice
    buckets = _bucket_assign(df, id_col, vec_col, num_planes, num_tables, seed, dim).localCheckpoint(
        eager=True
    )
    # one GEMM per (table, bucket) cogroup replaces the pair-explosion
    # join + per-pair interpreted dot: each bucket's cosine sub-matrix is
    # one BLAS multiply, each query keeps k per bucket, and the global
    # merge over ≤ tables·k candidates per query is exact (see helper)
    a = buckets.select(
        "_table", "_bucket", F.col("_id").alias("query_id"), F.col("_vec").alias("q_vec")
    )
    b = buckets.select(
        "_table", "_bucket", F.col("_id").alias("neighbor_id"), F.col("_vec").alias("c_vec")
    )
    local = _gemm_topk_cogrouped(a, b, ["_table", "_bucket"], k)
    merged = local.dropDuplicates(["query_id", "neighbor_id"])
    return topk_per_group(merged, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k)


def mmr_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k: greedy selection
    maximizing λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s) — the
    standard retrieval re-ranker that stops near-duplicate passages
    from crowding out coverage (RAG context assembly, eval-set
    construction).

    Two stages: the exact broadcast top-`pool` candidate generator
    (brute_force_topk — swap in lsh_bucketed_topk at scale; MMR only
    ever sees `pool` rows per query), then one Arrow-batched
    applyInPandas per query group that runs the O(pool²·k) greedy loop
    on a dense numpy matrix. State per task = pool × dim floats —
    independent of corpus size, so the operator's scale ceiling is the
    candidate generator's, not MMR's. Ties break on neighbor id;
    scores round to 6 so output is stable across partitionings.

    Output: query_id, neighbor_id, cos, mmr_rank (1-based), mmr_score.
    """
    cands = brute_force_topk(queries, corpus, id_col, vec_col, k=pool)
    withv = cands.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")),
        "neighbor_id",
    ).select("query_id", "neighbor_id", "cos", "nv")

    # id types mirror the caller's id column — string/int/long ids all work
    id_t = queries.schema[id_col].dataType.simpleString()
    out_schema = (
        f"query_id {id_t}, neighbor_id {id_t}, cos double, mmr_rank int, mmr_score double"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order: relevance desc, id asc
        pdf = pdf.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        v = np.stack(pdf["nv"].to_numpy())
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0.0] = 1.0
        v = v / norms[:, None]
        sims = v @ v.T
        rel = pdf["cos"].to_numpy()
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        taken = np.zeros(n, dtype=bool)
        for _ in range(min(k, n)):
            if not chosen:
                mmr = rel.copy()
            else:
                penalty = sims[:, chosen].max(axis=1)
                mmr = lam * rel - (1.0 - lam) * penalty
            mmr = np.where(taken, -np.inf, mmr)
            # argmax with id tiebreak: numpy argmax takes the first
            # occurrence in candidate order (already id-sorted per score)
            best = int(np.argmax(np.round(mmr, 9)))
            chosen.append(best)
            scores.append(float(mmr[best]))
            taken[best] = True
        sel = pdf.iloc[chosen][["query_id", "neighbor_id", "cos"]].copy()
        sel["mmr_rank"] = np.arange(1, len(chosen) + 1, dtype="int32")
        sel["mmr_score"] = np.round(np.array(scores), 6)
        return sel

    return withv.groupBy("query_id").applyInPandas(pick, schema=out_schema)

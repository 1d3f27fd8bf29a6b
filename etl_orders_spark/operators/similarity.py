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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_orders_spark.functions.vectors import cosine_similarity
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
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("cos"),
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


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Bit-bucket id: sign bits of the vector's dot products with each
    hyperplane, packed into a long. Pure Column expression."""
    bits = []
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(2**j)).otherwise(F.lit(0)))
    return sum(bits[1:], start=bits[0]).cast("long")


def _assign_nearest(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, n: int = 1
) -> DataFrame:
    """Score every vector against the broadcast centroid set and keep
    the `n` nearest (by cosine, ties to lower cluster id). Map-side:
    |C| is small by construction, the corpus never shuffles here."""
    scored = (
        vectors.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
        .crossJoin(F.broadcast(centroids))
        .select(
            "_vid",
            "_v",
            "cluster",
            cosine_similarity("_v", "cvec").alias("_cos"),
        )
    )
    return topk_per_group(scored, ["_vid"], [F.desc("_cos"), F.asc("cluster")], n)


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
    # deterministic hash-stride sample (~n_centroids rows) — the window
    # numbering runs over the tiny sample only, never the full corpus
    sample = df.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")).filter(
        F.abs(F.xxhash64(F.col("_cid").cast("string"))) % stride == 0
    )
    seeds = (
        sample.withColumn("_rn", F.row_number().over(Window.orderBy("_cid")) - 1)
        .filter(F.col("_rn") < n_centroids)
        .select(F.col("_rn").alias("cluster"), F.col("_cv").alias("cvec"))
    )
    if refine:
        assigned = _assign_nearest(df, seeds, id_col, vec_col, 1)
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
    cells = _assign_nearest(df, seeds, id_col, vec_col, 1).select(
        F.col("_vid").alias("neighbor_id"), F.col("_v").alias("c_vec"), "cluster"
    )
    probes = _assign_nearest(df, seeds, id_col, vec_col, nprobe).select(
        F.col("_vid").alias("query_id"), F.col("_v").alias("q_vec"), "cluster"
    )
    cand = probes.join(cells, "cluster").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("cos")
    ).dropDuplicates(["query_id", "neighbor_id"])
    return topk_per_group(scored, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k)


def near_dup_pairs_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 16,
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
    """
    tables = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed + t)
        tables.append(
            df.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_vec"),
                F.lit(t).alias("_table"),
                _bucket_expr(vec_col, planes).alias("_bucket"),
            )
        )
    buckets = tables[0]
    for t in tables[1:]:
        buckets = buckets.unionByName(t)
    # candidate id-pairs first (narrow shuffle: table, bucket, id only);
    # vectors and precomputed norms join back onto the deduped pairs, so
    # the exact rescore computes ONE array dot per pair instead of three
    # (dot + 2 norms) — interpreted higher-order aggregates are the cost
    a = buckets.select("_table", "_bucket", F.col("_id").alias("id_a"))
    b = buckets.select(
        F.col("_table").alias("_t2"),
        F.col("_bucket").alias("_b2"),
        F.col("_id").alias("id_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("_table") == F.col("_t2"))
            & (F.col("_bucket") == F.col("_b2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    from etl_orders_spark.functions.vectors import dot, l2_norm

    vecs = df.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"), l2_norm(vec_col).alias("_n")
    )
    va = vecs.select(F.col("_vid").alias("id_a"), F.col("_v").alias("ea"), F.col("_n").alias("na"))
    vb = vecs.select(F.col("_vid").alias("id_b"), F.col("_v").alias("eb"), F.col("_n").alias("nb"))
    scored = cand.join(va, "id_a").join(vb, "id_b")
    cos = F.round(
        F.when((F.col("na") == 0) | (F.col("nb") == 0), F.lit(0.0)).otherwise(
            dot("ea", "eb") / (F.col("na") * F.col("nb"))
        ),
        6,
    )
    return scored.select("id_a", "id_b", cos.alias("cos")).filter(F.col("cos") >= tau)


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
    tables = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, num_planes, seed + t)
        tables.append(
            df.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_vec"),
                F.lit(t).alias("_table"),
                _bucket_expr(vec_col, planes).alias("_bucket"),
            )
        )
    buckets = tables[0]
    for t in tables[1:]:
        buckets = buckets.unionByName(t)
    a = buckets.select(
        F.col("_table"), F.col("_bucket"), F.col("_id").alias("query_id"), F.col("_vec").alias("q_vec")
    )
    b = buckets.select(
        F.col("_table").alias("_table2"),
        F.col("_bucket").alias("_bucket2"),
        F.col("_id").alias("neighbor_id"),
        F.col("_vec").alias("c_vec"),
    )
    cand = (
        a.join(
            b,
            (F.col("_table") == F.col("_table2"))
            & (F.col("_bucket") == F.col("_bucket2"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", "q_vec", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine_similarity("q_vec", "c_vec"), 6).alias("cos")
    )
    return topk_per_group(scored, ["query_id"], [F.desc("cos"), F.asc("neighbor_id")], k)

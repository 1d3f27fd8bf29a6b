"""Materialize a small multi-consumer frame exactly once.

The trap this exists for: a DataFrame consumed by two or more
downstream subtrees is not "computed once and shared" — Catalyst
re-derives the WHOLE lineage per consumer, and exchange reuse only
unifies canonically-identical subplans (renamed, re-filtered, or
re-aggregated branches never qualify; nondeterministic expressions
like spark_partition_id disqualify outright). The runtime scan audit
(tools/scan_audit.py) caught a dozen plans silently paying 3-8 full
fact scans this way.

``materialize_small`` is the decision marker: call it ONLY on frames
that are provably small at any scale (cell tables bounded by category
cardinalities, day/month-grain series bounded by the calendar,
per-type sketch tables) — materializing something that grows with the
data (an explode output, a fact projection) can cost more than the
re-scan it saves, which is why this is an explicit opt-in and not a
blanket rule. Eager local checkpoint: computed now, lineage
truncated, every consumer reads the stored blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_small(df: DataFrame) -> DataFrame:
    """Eagerly materialize a PROVABLY-SMALL multi-consumer frame."""
    return df.localCheckpoint(eager=True)


def const_rows(
    spark: SparkSession, rows: list[tuple], fields: list[tuple[str, str]]
) -> DataFrame:
    """A small CONSTANT inline table built from literal expressions
    (range(1) + explode(array(struct(lit...)))) instead of
    ``createDataFrame``.

    Why this exists: ``createDataFrame`` embeds a LocalRelation whose
    InternalRows compare by REFERENCE, so two builder invocations of
    the same constant table are NEVER ``sameResult``-equal — which
    silently defeats every keyed ``cache_stage`` downstream of it (a
    rebuilt plan looks "different", so each invocation re-persists a
    fresh copy and reads nothing back; measured on hybrid_rrf's arm
    caches, round 12). Literal expressions canonicalize structurally,
    so rebuilt plans compare equal and the keyed caches hit.

    ``rows``: list of value tuples; ``fields``: [(name, ddl_type)]
    aligned with the tuple positions. Values are embedded as typed
    literals — same rows, same types, same semantics as the
    createDataFrame form. Constant-size tables only (every row is an
    expression in the plan)."""
    # the when(id >= 0, ...) wrapper keeps each field NULLABLE,
    # matching the createDataFrame schema this replaces (bare literals
    # would flip nullability and change the declared output schema of
    # any lane whose output carries these columns; a when(lit(True))
    # form is already folded non-nullable at analysis — the predicate
    # must reference a column). id is 0 on the single range row, so
    # the branch is always taken and values are unchanged.
    structs = [
        F.struct(
            *[
                F.when(F.col("id") >= 0, F.lit(v).cast(t)).alias(n)
                for v, (n, t) in zip(row, fields)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select(*[F.col(f"_r.{n}").alias(n) for n, _ in fields])
    )


# Per call site: a tiny FIFO of live cache handles (newest last).
# Two slots, not one: a generic operator invoked over two DIFFERENT
# inputs in alternation (e.g. ngram_jaccard_pairs on two corpora in
# one session) would otherwise evict the other input's cache on every
# build and silently lose the materialize-once property both plans
# paid for. Bounded at _STAGE_SLOTS per site either way.
_STAGE_SLOTS = 2
_STAGE_CACHE: dict[str, list[DataFrame]] = {}


def cache_stage(df: DataFrame, key: str) -> DataFrame:
    """Lazily persist a LARGE multi-consumer stage, releasing the
    PREVIOUS invocation's cache for the same key first.

    Why not localCheckpoint here: a checkpoint is an opaque RDD scan
    barrier — Catalyst can neither prune columns nor push filters
    through it, and the eager materialization is paid even for rows a
    downstream filter would drop. For corpus-sized stages that
    difference is brutal (measured: llm_prep_corpus 1.8s -> 9.9s when
    its two cached stages were converted to eager checkpoints).
    ``persist`` keeps the InMemoryRelation optimizer-transparent and
    populates lazily inside the query's own action.

    Why not bare persist: DataFrame caches live in the CacheManager,
    which holds its own reference — they are NOT reclaimed when the
    Python handle is GC'd (unlike localCheckpoint blocks, which the
    ContextCleaner frees), so repeated invocations in a long-lived
    session accumulate cached blocks without bound. The keyed registry
    bounds that at _STAGE_SLOTS live caches per call site: a new plan
    evicts (unpersists, non-blocking) the oldest entry beyond the cap.

    Warm reuse: when the same call site rebuilds the SAME logical plan
    (re-running a query in one session — the bench's repeated reps,
    an analyst iterating), the existing cached frame is returned
    as-is, so later runs read the already-populated cache instead of
    recomputing (this matches what CacheManager's plan-keyed dedupe
    did for bare persist, minus its unbounded handle growth). Only
    when the plan actually CHANGED (new data dir, new params) is the
    predecessor unpersisted and replaced.

    Single-threaded builders assumed (the registry/bench/driver all
    build serially); a racing rebuild would at worst re-cache, never
    corrupt results.

    Freshness contract (ADVICE r11 #3): input parquet dirs are
    IMMUTABLE for the life of a session — the warm-reuse path returns
    cached blocks for an identical logical plan, so rewriting files
    under an sf_dir mid-session would serve stale data that a
    per-call checkpoint would have re-read. Every harness here
    honors it (testdata is generated once; bench/driver sessions
    never rewrite inputs). After regenerating test data in a live
    session, call ``spark.catalog.clearCache()`` (bench.py already
    does per lane), which these handles detect via storageLevel and
    re-persist."""
    slots = _STAGE_CACHE.setdefault(key, [])
    keep: list[DataFrame] = []
    hit: DataFrame | None = None
    for old in slots:
        try:
            # storageLevel guards against an external clearCache()/
            # unpersist having dropped the entry while the handle
            # survived (is_cached is a stale Python-side flag) — a
            # stale handle must re-persist, not masquerade as cached
            lvl = old.storageLevel
            alive = lvl.useMemory or lvl.useDisk
            if alive and hit is None and old._jdf.queryExecution().analyzed().sameResult(
                df._jdf.queryExecution().analyzed()
            ):
                hit = old
            if alive:
                keep.append(old)
        except Exception:  # noqa: BLE001 — dead session handle: drop it
            pass
    if hit is not None:
        # refresh recency: the hit moves to the back of the FIFO
        keep.remove(hit)
        keep.append(hit)
        _STAGE_CACHE[key] = keep
        return hit
    out = df.persist()
    keep.append(out)
    while len(keep) > _STAGE_SLOTS:
        evicted = keep.pop(0)
        try:
            evicted.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — a dead session's handle is already free
            pass
    _STAGE_CACHE[key] = keep
    return out


def fan_out_narrow(df: DataFrame, key: str, max_bytes: int = 1 << 30) -> DataFrame:
    """Redistribute a NARROW file-scan input across the session's full
    parallelism so CPU-heavy per-row chains above it use every core.

    The problem (VERDICT r6 #1, root-caused round 7): a small table
    stored as one single-row-group parquet file scans as ONE input
    partition, and Catalyst PUSHES filters back through any
    ``repartition`` to the scan side — so a regex-heavy quality/
    lang-id/fingerprint chain runs single-threaded on a 32-core box
    no matter where the repartition is written. llm_prep_corpus's
    "9.8x cold" was exactly this: ~11 s of one-task expression
    evaluation, not a cache-rebuild pathology.

    The fix: shuffle the RAW rows to ``defaultParallelism`` partitions
    and pin them behind a keyed lazy cache (``cache_stage``). An
    InMemoryRelation is a predicate-pushdown barrier, so the heavy
    chain stays ABOVE the exchange and parallelizes even on its first
    (cache-filling) execution, while column pruning still works at
    scan time (cached batches are columnar).

    100 TB posture: this must NEVER fire on a real corpus — caching a
    redistributed 100 TB table would be catastrophic. Two driver-side
    gates keep it honest: the input must already be NARROW (fewer
    partitions than half the session parallelism — a real corpus
    scans as thousands of splits), and its total scan bytes must be
    known and bounded (``max_bytes``, default 1 GiB). When either
    gate fails the input is returned untouched, making this a no-op
    exactly where the cluster's natural parallelism already exists."""
    import os as _os

    # measurement/ops kill switch (SCALE.md round-8 warm A/B): lets a
    # bench cell or an operator compare fan-out-on vs -off under
    # otherwise identical conditions without a code edit
    if _os.environ.get("SPARK_GRAFT_FANOUT", "1") == "0":
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — unconvertible plan: leave untouched
        return df
    if parts * 2 >= target:
        return df
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
        total = 0
        for uri in files:
            # inputFiles() returns percent-encoded URIs; decode before
            # stat'ing or paths with spaces fall into the except and
            # silently disable the fan-out
            path = unquote(urlparse(uri).path) if "://" in uri or uri.startswith("file:") else uri
            total += os.path.getsize(path)
    except Exception:  # noqa: BLE001 — non-local / unknown source: do not widen blind
        return df
    if not files or total > max_bytes:
        return df
    return cache_stage(df.repartition(target), f"fan_out_narrow.{key}")

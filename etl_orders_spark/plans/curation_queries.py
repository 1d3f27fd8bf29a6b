"""Corpus-curation queries: PII redaction, LM-based quality scoring,
and near-dup canonicalization — the decision layer a training-data
pipeline runs after the detection layer (dedup/quality/lang) has done
its work.

The reference has no text surface at all (its richest transform is a
gender recode, reference: dags/etl.py:60); these generalize SURVEY.md
§2.2's value-recode/projection rows to the operations a 100 TB corpus
actually needs before tokens reach a trainer.

Determinism conventions follow plans/registry.py: per-term log scores
floor to integer micro-nats BEFORE summing (ln() ulps must not reach a
float hash), regex patterns are the RE2∩Java common dialect so Spark
and DuckDB extract identical spans, and every ranking orders by a
rounded measure plus doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_orders_spark.functions.text import quality_score, tokens
from etl_orders_spark.operators.dedup import ngram_jaccard_pairs
from etl_orders_spark.operators.graph import connected_components
from etl_orders_spark.plans.registry import register
from etl_orders_spark.plans.text_queries import (
    _JACCARD_THRESHOLD,
    _LOWER_TOKENS,
    _NGRAM_PAIR_CTES,
    _NORM,
    _QUALITY,
)
from etl_orders_spark.sources.readers import load_table as T

# --- PII redaction ----------------------------------------------------------
# Patterns restricted to the RE2 ∩ Java-regex common dialect (no
# lookaround, no backrefs) so Spark and DuckDB match identical spans.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# digit-count bound (7+ digits, each with up to 3 trailing separators),
# not char-count — see functions/privacy.PHONE_RE for the rationale
_PII_PHONE = r"\+?\d(?:[\- ()]{0,3}\d){6,}"


@register(
    "pii_redact_docs",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g')) AS redact_fp
    FROM documents
    """,
    tags=("text", "privacy"),
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: count and redact emails, IPv4s, and
    phone-shaped digit runs per document. Pure map stage — zero
    shuffles, scales linearly with scanned bytes; the redacted text is
    fingerprinted (md5) so the full output stays narrow. Replacement
    order is fixed (email → ip → phone) because the phone pattern can
    overlap digits inside an IP; counts are measured on the ORIGINAL
    text so they are order-independent."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
            _PII_IP,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_email"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_IP), F.lit(0)))
        .cast("long")
        .alias("n_ip"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phone"),
        F.md5(redacted).alias("redact_fp"),
    )


# --- unigram-LM surprisal ---------------------------------------------------


@register(
    "unigram_surprisal_docs",
    f"""
    WITH tok AS (
      SELECT doc_id, UNNEST({_LOWER_TOKENS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
    ), freq AS (
      SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM freq
    ), m AS (
      SELECT term,
             CAST(FLOOR(-ln(CAST(cnt AS DOUBLE) / n) * 1000000.0 + 0.5) AS BIGINT) AS micro
      FROM freq CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf * micro) AS BIGINT) AS surprisal_micro
    FROM tf JOIN m USING (term) GROUP BY doc_id
    """,
    tags=("text", "quality", "lm"),
)
def unigram_surprisal_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram LM —
    the classic cheap "perplexity" quality score (high surprisal =
    rare-token soup, low = repetitive boilerplate). Per-TERM surprisal
    floors to integer micro-nats before the per-document sum, so
    neither ln() ulps nor summation order can flip the value hash
    (same trick as bm25_search_docs). Scale shape: one (doc, term)
    shuffle for tf, one term shuffle for the LM, one term-keyed join
    back — no broadcast of the unbounded vocabulary, and the 1-row
    total joins as a broadcast literal."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint(eager=True)  # read by the LM branch and the scoring join
    )
    freq = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("n"))
    lm = freq.crossJoin(F.broadcast(total)).select(
        "term",
        F.floor(-F.log(F.col("cnt").cast("double") / F.col("n")) * 1000000.0 + 0.5)
        .cast("long")
        .alias("micro"),
    )
    return (
        tf.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("micro")).cast("long").alias("surprisal_micro"),
        )
    )


# --- near-dup canonicalization ---------------------------------------------


@register(
    "near_dedup_keep_best",
    f"""
    WITH RECURSIVE {_NGRAM_PAIR_CTES}, edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(v, u) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.v, e.d FROM reach r JOIN edges e ON e.s = r.u
    ), clusters AS (
      SELECT v AS doc_id, MIN(u) AS cluster_id FROM reach GROUP BY v
    ), scored AS (
      SELECT c.cluster_id, d.doc_id,
             CAST(FLOOR(({_QUALITY}) * 10000.0 + 0.5) AS BIGINT) AS q_um,
             CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS n_members
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id, doc_id, q_um, n_members FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY q_um DESC, doc_id) = 1
    """,
    tags=("text", "dedup", "graph"),
)
def near_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION: collapse each near-dup cluster (transitive
    n-gram-Jaccard pairs) to its single best survivor by quality score,
    ties to lower doc_id. This is what actually ships to the trainer —
    detection (pairs), clustering (connected components), and selection
    (rank-1 per cluster) in one plan. The oracle replays the whole
    chain as a recursive CTE. Quality scores floor to integer
    10⁻⁴-units before ranking/output — per-row ROUND(double, n) is
    HALF_UP in Spark but half-even in DuckDB."""
    docs = T(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k_shingle=3, threshold=_JACCARD_THRESHOLD)
    clusters = connected_components(docs.select("doc_id"), pairs, "doc_id")
    scored = clusters.join(docs, "doc_id").select(
        F.col("component").alias("cluster_id"),
        "doc_id",
        F.floor(quality_score("text") * 10000.0 + 0.5).cast("long").alias("q_um"),
    )
    w = Window.partitionBy("cluster_id")
    ranked = scored.withColumn("n_members", F.count("*").over(w).cast("long")).withColumn(
        "_rk", F.row_number().over(w.orderBy(F.desc("q_um"), F.asc("doc_id")))
    )
    return ranked.filter(F.col("_rk") == 1).select("cluster_id", "doc_id", "q_um", "n_members")


_SAMPLE_K = 5


@register(
    "sample_per_group_docs",
    f"""
    SELECT source, doc_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
    FROM documents
    QUALIFY rk <= {_SAMPLE_K}
    """,
    tags=("sampling", "window"),
)
def sample_per_group_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sampling: k docs per source, ordered by
    a hash of the id — statistically uniform, reproducible across runs
    and engines (unlike rand()-based sampleBy), and one shuffle on the
    group key with no global sort. The inspection/eval-set primitive:
    at 100 TB "show me 5 random docs per source" must not scan-and-sort
    the corpus. Window top-k per group prunes to k rows per partition
    before the final merge."""
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        T(spark, sf_dir, "documents")
        .select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _SAMPLE_K)
    )


_PMI_MIN_COUNT = 5
_PMI_TOPK = 30


@register(
    "pmi_bigrams_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_LOWER_TOKENS} AS t FROM documents
    ), bg AS (
      SELECT UNNEST(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    ), uni AS (
      SELECT UNNEST(t) AS term FROM toks
    ), cb AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1
    ), cu AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1
    ), tb AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS t FROM cb),
    tu AS (SELECT CAST(SUM(c) AS DOUBLE) AS u FROM cu),
    scored AS (
      SELECT cb.bigram, cb.c_ab,
             CAST(FLOOR(ln(CAST(cb.c_ab AS DOUBLE) / tb.t) * 1000000.0 + 0.5) AS BIGINT)
             - CAST(FLOOR(ln(CAST(ca.c AS DOUBLE) / tu.u) * 1000000.0 + 0.5) AS BIGINT)
             - CAST(FLOOR(ln(CAST(cbb.c AS DOUBLE) / tu.u) * 1000000.0 + 0.5) AS BIGINT)
               AS pmi_micro
      FROM cb
      JOIN cu ca ON ca.term = string_split(cb.bigram, ' ')[1]
      JOIN cu cbb ON cbb.term = string_split(cb.bigram, ' ')[2]
      CROSS JOIN tb CROSS JOIN tu
      WHERE cb.c_ab >= {_PMI_MIN_COUNT}
    )
    SELECT bigram, c_ab, pmi_micro FROM scored
    ORDER BY pmi_micro DESC, bigram LIMIT {_PMI_TOPK}
    """,
    tags=("text", "lm", "collocation"),
)
def pmi_bigrams_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top bigrams by pointwise mutual information
    — the classic signal for multi-word expressions worth protecting
    from tokenizer splits. Each of the three log terms floors to
    integer micro-nats SEPARATELY, so the PMI is an exact integer
    difference and no cross-engine float ever reaches the hash. Scale
    shape: bigram and unigram counts are one shuffle each; the two
    scalar totals broadcast; the per-bigram join keys on the component
    terms (never a cross join)."""
    toks = T(spark, sf_dir, "documents").select(
        tokens(F.lower(F.col("text"))).alias("t")
    )
    from etl_orders_spark.functions.text import word_bigrams

    bg = toks.select(F.explode(word_bigrams(F.col("t"))).alias("bigram"))
    uni = toks.select(F.explode("t").alias("term"))
    cb = bg.groupBy("bigram").agg(F.count("*").cast("long").alias("c_ab"))
    cu = uni.groupBy("term").agg(F.count("*").cast("long").alias("c")).localCheckpoint(
        eager=True
    )  # probed twice (left + right component of each bigram)
    tb = cb.agg(F.sum("c_ab").cast("double").alias("t"))
    tu = cu.agg(F.sum("c").cast("double").alias("u"))

    def _micro(num: F.Column, den: F.Column) -> F.Column:
        return F.floor(F.log(num.cast("double") / den) * 1000000.0 + 0.5).cast("long")

    ca = cu.select(F.col("term").alias("_ta"), F.col("c").alias("_cca"))
    cbb = cu.select(F.col("term").alias("_tb"), F.col("c").alias("_ccb"))
    scored = (
        cb.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .withColumn("_ta", F.split("bigram", " ").getItem(0))
        .withColumn("_tb", F.split("bigram", " ").getItem(1))
        .join(ca, "_ta")
        .join(cbb, "_tb")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tu))
        .select(
            "bigram",
            "c_ab",
            (
                _micro(F.col("c_ab"), F.col("t"))
                - _micro(F.col("_cca"), F.col("u"))
                - _micro(F.col("_ccb"), F.col("u"))
            ).alias("pmi_micro"),
        )
    )
    return scored.orderBy(F.desc("pmi_micro"), F.asc("bigram")).limit(_PMI_TOPK)


_FORGET_MOD = 1000
_FORGET_REMAINDER = 7


@register(
    "gdpr_forget_report",
    f"""
    WITH forget AS (
      SELECT c_custkey FROM customer WHERE c_custkey % {_FORGET_MOD} = {_FORGET_REMAINDER}
    ), purged_orders AS (
      SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM forget)
    )
    SELECT 'customer' AS tbl,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS rows_before,
           CAST((SELECT COUNT(*) FROM forget) AS BIGINT) AS rows_purged
    UNION ALL
    SELECT 'orders',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM purged_orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM purged_orders)) AS BIGINT)
    """,
    tags=("privacy", "join", "anti"),
)
def gdpr_forget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation audit: a simulated deletion
    request set (every customer key ≡ {_FORGET_REMAINDER} mod
    {_FORGET_MOD}) cascades customer → orders → lineitem, and the
    report counts what each hop would purge. The cascade is two
    semi-joins — the forget set broadcasts, the fact tables are never
    shuffled — which is the only affordable shape when the request set
    is thousands of keys against 100 TB of facts. (The actual purge is
    the same plan with left_anti + overwrite.)"""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    forget = cust.filter(F.col("c_custkey") % _FORGET_MOD == _FORGET_REMAINDER).select(
        "c_custkey"
    )
    purged_orders = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")
    purged_li = li.join(F.broadcast(purged_orders), li.l_orderkey == purged_orders.o_orderkey, "left_semi")

    def _row(name: str, total, purged) -> DataFrame:
        return total.crossJoin(purged).select(
            F.lit(name).alias("tbl"),
            F.col("_n").cast("long").alias("rows_before"),
            F.col("_p").cast("long").alias("rows_purged"),
        )

    rows = [
        _row("customer", cust.agg(F.count("*").alias("_n")), forget.agg(F.count("*").alias("_p"))),
        _row("orders", orders.agg(F.count("*").alias("_n")), purged_orders.agg(F.count("*").alias("_p"))),
        _row("lineitem", li.agg(F.count("*").alias("_n")), purged_li.agg(F.count("*").alias("_p"))),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- per-source curation report ---------------------------------------------


@register(
    "source_quality_report",
    f"""
    WITH d AS (
      SELECT doc_id, source, n_chars, md5({_NORM}) AS f,
             CAST(FLOOR(({_QUALITY}) * 1000.0) AS BIGINT) AS q_milli
      FROM documents
    ), cnt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1),
    r AS (
      SELECT d.source, d.n_chars, d.q_milli,
             CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END AS is_dup,
             ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.n_chars, d.doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY d.source) AS n
      FROM d JOIN cnt ON d.f = cnt.f
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
           CAST(SUM(q_milli) // MAX(n) AS BIGINT) AS mean_quality_milli,
           CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN n_chars END) AS BIGINT) AS p50_chars
    FROM r GROUP BY source
    """,
    tags=("text", "curation", "dq"),
    bench=True,  # the curation family's bench representative (r4)
)
def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation scorecard: doc count, exact-dup membership
    count (fingerprint shared with ANY doc corpus-wide), mean quality
    (per-doc milli-scores floored before the truncating mean), and
    the exact lower-median length via the rank window — the table a
    data curator reads before deciding per-source sampling weights.

    Scale: the fingerprint count join shuffles on the 32-char md5 key
    (never text); the median comes from one source-partitioned window
    — state scales with the biggest single source, and a skewed mega-
    source falls back to the sketch path (approx_percentile) without
    changing the report schema."""
    from etl_orders_spark.functions.text import fingerprint
    from etl_orders_spark.operators.materialize import cache_stage

    # d feeds the fingerprint count AND the scoring join; cache it so
    # the md5/quality expression chain evaluates once per doc
    d = cache_stage(
        T(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            "n_chars",
            fingerprint("text").alias("f"),
            F.floor(quality_score("text") * F.lit(1000.0)).cast("long").alias("q_milli"),
        ),
        "source_quality_report.d",
    )
    cnt = d.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("c"))
    j = d.join(cnt, "f").withColumn(
        "is_dup", F.when(F.col("c") > 1, 1).otherwise(0)
    )
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    r = j.select(
        "source",
        "n_chars",
        "q_milli",
        "is_dup",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup_docs"),
        F.expr("sum(q_milli) div max(n)").cast("long").alias("mean_quality_milli"),
        F.max(F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("n_chars")))
        .cast("long")
        .alias("p50_chars"),
    )


# --- incremental crawl dedup ------------------------------------------------


@register(
    "dedup_incremental_docs",
    f"""
    WITH d AS (SELECT doc_id, md5({_NORM}) AS f FROM documents),
    base AS (SELECT DISTINCT f FROM d WHERE doc_id % 10 <> 0),
    batch AS (
      SELECT d.doc_id, d.f,
             CASE WHEN base.f IS NOT NULL THEN 1 ELSE 0 END AS in_base,
             ROW_NUMBER() OVER (PARTITION BY d.f ORDER BY d.doc_id) AS rk
      FROM d LEFT JOIN base ON d.f = base.f
      WHERE d.doc_id % 10 = 0
    )
    SELECT doc_id, f,
           CASE WHEN in_base = 1 THEN 'dup_of_base'
                WHEN rk > 1 THEN 'dup_in_batch'
                ELSE 'accepted' END AS status
    FROM batch
    """,
    tags=("text", "dedup", "curation"),
)
def dedup_incremental_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (nightly-crawl) dedup: a new batch (doc_id % 10 = 0
    stands in for today's crawl) is screened against the accumulated
    base corpus's fingerprint set, then within itself — each batch doc
    labeled accepted / dup_of_base / dup_in_batch, the decision feed
    an append-only corpus actually consumes.

    Scale: the base side is fingerprints only (32-char keys, the big
    sorted/bucketed table in production); the membership check is a
    key-partitioned left join — with the base bucketed by f it is
    exchange-free on that side — and in-batch dedup is a window over
    the (small) daily batch. Text never shuffles."""
    from etl_orders_spark.functions.text import fingerprint

    d = T(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("f")
    )
    base = d.filter(F.col("doc_id") % 10 != 0).select("f").distinct()
    batch = d.filter(F.col("doc_id") % 10 == 0)
    j = batch.join(
        base.withColumn("_hit", F.lit(1)), "f", "left"
    ).withColumn("rk", F.row_number().over(Window.partitionBy("f").orderBy("doc_id")))
    return j.select(
        "doc_id",
        "f",
        F.when(F.col("_hit") == 1, "dup_of_base")
        .when(F.col("rk") > 1, "dup_in_batch")
        .otherwise("accepted")
        .alias("status"),
    )


# --- per-language quality threshold calibration ------------------------------


@register(
    "calibrated_quality_thresholds",
    f"""
    WITH d AS (
      SELECT doc_id, lang, CAST(FLOOR(({_QUALITY}) * 1000.0) AS BIGINT) AS q_milli
      FROM documents
    ), r AS (
      SELECT lang, q_milli,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q_milli DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM d
    )
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rk = (n * 80 + 99) // 100 THEN q_milli END) AS BIGINT) AS q80_threshold_milli,
           CAST(SUM(CASE WHEN rk <= (n * 80 + 99) // 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM r GROUP BY lang
    """,
    tags=("text", "curation", "stats"),
)
def calibrated_quality_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-cutoff calibration per language: the score at the 80%
    keep-rate (rank-based, exact) and the kept count — computed
    per-language because a single global threshold silently starves
    low-resource languages (their score distributions sit lower).
    This is the knob-setting query run before llm_prep_corpus's
    filter stage.

    Scale: one lang-partitioned rank window over (lang, q_milli) —
    state bounded by the largest language; the documented mega-
    partition fallback is approx_percentile with identical schema."""
    from etl_orders_spark.functions.text import quality_score

    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.floor(quality_score("text") * F.lit(1000.0)).cast("long").alias("q_milli"),
    )
    wr = Window.partitionBy("lang").orderBy(F.desc("q_milli"), "doc_id")
    wn = Window.partitionBy("lang")
    r = d.select(
        "lang",
        "q_milli",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kth = F.expr("(n * 80 + 99) div 100")
    return r.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.max(F.when(F.col("rk") == kth, F.col("q_milli")))
        .cast("long")
        .alias("q80_threshold_milli"),
        F.sum(F.when(F.col("rk") <= kth, 1).otherwise(0)).cast("long").alias("n_kept"),
    )


# --- cross-source duplication matrix ----------------------------------------


@register(
    "cross_source_dup_matrix",
    f"""
    WITH fp AS (
      SELECT DISTINCT source, md5({_NORM}) AS f FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fps
    FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
    GROUP BY 1, 2
    """,
    tags=("text", "dedup", "curation"),
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: how many distinct normalized
    fingerprints each source PAIR shares — the syndication/mirroring
    map that decides which source to drop when two crawls overlap
    (complementing source_quality_report's per-source dup counts with
    WHO duplicates WHOM).

    Scale: per-source distinct fingerprints first (text never leaves
    the scan), then a fingerprint-keyed self-join — the join key is
    the 32-hex md5, and only fingerprints present in 2+ sources
    produce any join output."""
    from etl_orders_spark.functions.text import fingerprint

    fp = (
        T(spark, sf_dir, "documents")
        .select("source", fingerprint("text").alias("f"))
        .distinct()
    )
    a = fp.toDF("source_a", "f")
    b = fp.toDF("source_b", "f")
    return (
        a.join(b, "f")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fps"))
    )


_AES_K = 5  # sample size per source stratum
# portable uniform in (0,1): 32-bit md5 prefix, offset half a step so
# u is never exactly 0 (ln(0) = -inf) or 1
_AES_U_SQL = (
    "(CAST(('0x' || substr(md5('aes|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)"
    " / 4294967296.0"
)


@register(
    "weighted_sample_per_source",
    f"""
    WITH k AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(FLOOR(LN({_AES_U_SQL}) / GREATEST(n_chars, 1) * 1000000000000.0) AS BIGINT)
               AS key_pico
      FROM documents
    )
    SELECT source, doc_id, n_chars, key_pico, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY key_pico DESC, doc_id) AS rk
      FROM k
    ) r WHERE rk <= {_AES_K}
    """,
    tags=("text", "pipeline", "sampling", "curation"),
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, distributed: an exact
    5-doc (_AES_K) sample per source with inclusion probability proportional
    to document length, via the Efraimidis-Spirakis A-ES key — each
    doc draws key = ln(u)/w from a portable content-independent hash
    uniform u, and the top-k keys per stratum ARE the weighted sample.
    This is the one-pass, shuffle-once form of weighted reservoir
    sampling: no sequential reservoir state, no RNG coordination —
    any engine that ranks the same keys draws the same sample, which
    is what a reproducible training-mix recipe needs (Bernoulli
    mixture sampling can't hit an exact per-stratum size; naive
    sort-by-random isn't weighted). Keys floor to integer pico-units
    so the cross-engine ranking compares exact integers (ties broken
    by doc_id), per the registry's determinism conventions. One map
    stage + one source-keyed top-k window; at 100 TB the window is
    replaced by the same per-partition-heap + merge the topk operator
    family documents, still never a global sort.
    """
    d = T(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("aes|"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    key_pico = F.floor(
        F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double") * F.lit(1e12)
    ).cast("long")
    w = Window.partitionBy("source").orderBy(F.desc("key_pico"), "doc_id")
    return (
        d.select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
        .withColumn("key_pico", key_pico)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _AES_K)
        .select("source", "doc_id", "n_chars", "key_pico", "rk")
    )


_SHARD_SIZE = 256  # docs per training shard


@register(
    "shuffle_corpus_shards",
    f"""
    WITH keyed AS (
      SELECT doc_id, md5('shuf|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    ), ranked AS (
      SELECT doc_id, shuffle_key,
             ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS rk
      FROM keyed
    )
    SELECT doc_id, shuffle_key,
           CAST((rk - 1) // {_SHARD_SIZE} AS BIGINT) AS shard,
           CAST((rk - 1) % {_SHARD_SIZE} AS BIGINT) AS pos
    FROM ranked
    """,
    tags=("curation", "pipeline", "sampling", "layout"),
)
def shuffle_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into fixed-size training shards —
    the last step before a corpus reaches a trainer: a document's
    position must be decorrelated from its crawl/source order (batch
    order bias) yet exactly reproducible run-to-run and engine-to-
    engine. Each doc draws a content-independent portable key
    (md5 over a salted doc_id, identical bytes in any engine); its
    global rank in key order is its permutation index; shard and
    in-shard position are pure integer arithmetic on that rank.

    The global rank comes from operators/rank.two_pass_rank — a
    range partition on the (uniform) key plus broadcast per-partition
    offsets — so the permutation is exact with NO single-partition
    sort stage: the one pattern that cannot ship at 100 TB is
    ``ORDER BY rand()`` through one task. In production the result
    writes ``partitionBy(shard)`` (sources/writers.write_parquet) and
    shard files stream to the trainer in shard order; re-keying with a
    different salt is a fresh epoch-level reshuffle at one scan's
    cost. Uniformity of md5 makes the range partitions balanced by
    construction — no skew caveat.
    """
    from etl_orders_spark.operators.rank import two_pass_rank

    keyed = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("shuf|"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    ranked = two_pass_rank(
        keyed, order_by=[F.col("shuffle_key"), F.col("doc_id")], rank_col="rk"
    )
    return ranked.select(
        "doc_id",
        "shuffle_key",
        F.expr(f"(rk - 1) div {_SHARD_SIZE}").cast("long").alias("shard"),
        F.pmod(F.col("rk") - 1, F.lit(_SHARD_SIZE)).cast("long").alias("pos"),
    )


# --- DSIR: hashed n-gram importance resampling ------------------------------
# Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling" (DSIR): select raw-corpus documents whose hashed n-gram
# feature distribution looks like a small TARGET domain, by importance
# weight w(x) = p_target(x) / p_raw(x) under bag-of-hashed-features
# unigram models. Here the target domain is the corpus's English
# slice and the raw pool is everything — the shape a curation pass
# uses to upsample domain-matched text out of a crawl.
_DSIR_B = 512  # hashed feature buckets
_DSIR_K = 100  # documents resampled (top-k by importance weight)

_DSIR_BUCKET_SQL = (
    "CAST(('0x' || substr(md5('dsir|' || term), 1, 8)) AS BIGINT) % 512"
)


def _micro_ln_sql(expr: str) -> str:
    return f"CAST(FLOOR(LN({expr}) * 1000000.0 + 0.5) AS BIGINT)"


@register(
    "dsir_importance_resample",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, UNNEST({_LOWER_TOKENS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang, {_DSIR_BUCKET_SQL} AS b,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, {_DSIR_BUCKET_SQL}
    ), raw AS (
      SELECT b, CAST(SUM(tf) AS BIGINT) AS cnt_r FROM tf GROUP BY b
    ), tgt AS (
      SELECT b, CAST(SUM(tf) AS BIGINT) AS cnt_t FROM tf
      WHERE lang = 'en' GROUP BY b
    ), tot AS (
      SELECT (SELECT CAST(SUM(cnt_r) AS BIGINT) FROM raw) AS t_r,
             (SELECT CAST(COALESCE(SUM(cnt_t), 0) AS BIGINT) FROM tgt) AS t_t
    ), lm AS (
      SELECT r.b,
             {_micro_ln_sql("COALESCE(g.cnt_t, 0) + 1")}
           - {_micro_ln_sql("t.t_t + " + str(_DSIR_B))}
           - {_micro_ln_sql("r.cnt_r + 1")}
           + {_micro_ln_sql("t.t_r + " + str(_DSIR_B))} AS micro
      FROM raw r LEFT JOIN tgt g USING (b) CROSS JOIN tot t
    )
    SELECT doc_id, ANY_VALUE(lang) AS lang,
           CAST(SUM(tf) AS BIGINT) AS n_toks,
           CAST(SUM(tf * micro) AS BIGINT) AS logw_micro
    FROM tf JOIN lm USING (b)
    GROUP BY doc_id
    ORDER BY logw_micro DESC, doc_id
    LIMIT {_DSIR_K}
    """,
    tags=("text", "curation", "llm", "sampling"),
    bench=True,
)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): score every raw
    document by log w = sum over token occurrences of
    ln p_target(bucket) - ln p_raw(bucket), under Laplace-smoothed
    hashed-unigram models ((cnt + 1) / (total + B), B = {B} buckets,
    portable md5 bucket hash), and keep the top-{K} by weight — the
    deterministic-selection form of the paper's Gumbel resample (the
    ranking, which is the engine's job, is identical; swapping in
    Gumbel noise is one extra hashed-uniform column, the pattern
    weighted_sample_per_source already certifies). Each of the four
    ln() terms floors to integer micro-nats SEPARATELY before any
    arithmetic, so the per-bucket score and the per-document sum are
    integer-exact across engines — no ulp can flip the hash.

    Plan shape at 100 TB: token->bucket is a pure map; the two LM
    aggregates are bucket-keyed with map-side partials over a FIXED
    B={B}-row key space (the whole point of hashed features: the
    model table is bounded regardless of corpus vocabulary, unlike
    the surprisal lane's open vocab); the {B}-row model broadcasts,
    so scoring adds ZERO shuffles beyond the one doc-grain aggregate;
    selection is TakeOrderedAndProject (per-partition heaps + merge),
    never a global sort. One (doc, bucket) exchange, one broadcast,
    one top-k."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens(F.lower(F.col("text"))).alias("toks")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir|"), F.col("term"))), 1, 8),
            16,
            10,
        ).cast("long")
        % _DSIR_B
    )
    tf = (
        d.select("doc_id", "lang", F.explode("toks").alias("term"))
        .select("doc_id", "lang", bucket.alias("b"))
        .groupBy("doc_id", "b")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").cast("long").alias("tf"),
        )
        .localCheckpoint(eager=True)  # read by both LM branches + scoring
    )
    raw = tf.groupBy("b").agg(F.sum("tf").cast("long").alias("cnt_r"))
    tgt = (
        tf.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("tf").cast("long").alias("cnt_t"))
    )
    tot = raw.agg(F.sum("cnt_r").cast("long").alias("t_r")).crossJoin(
        tgt.agg(
            F.coalesce(F.sum("cnt_t"), F.lit(0)).cast("long").alias("t_t")
        )
    )

    def _micro_ln(col: F.Column) -> F.Column:
        return F.floor(F.log(col.cast("double")) * 1000000.0 + 0.5).cast("long")

    lm = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                _micro_ln(F.coalesce(F.col("cnt_t"), F.lit(0)) + 1)
                - _micro_ln(F.col("t_t") + _DSIR_B)
                - _micro_ln(F.col("cnt_r") + 1)
                + _micro_ln(F.col("t_r") + _DSIR_B)
            ).alias("micro"),
        )
    )
    return (
        tf.join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.sum("tf").cast("long").alias("n_toks"),
            F.sum(F.col("tf") * F.col("micro")).cast("long").alias("logw_micro"),
        )
        .orderBy(F.desc("logw_micro"), "doc_id")
        .limit(_DSIR_K)
        .select("doc_id", "lang", "n_toks", "logw_micro")
    )


# --- quality-classifier training (logistic regression, unrolled GD) ---------
# The standard LLM-curation quality filter is a small linear classifier
# (CCNet / DCLM use fastText-class models) scored over cheap text
# features. This lane TRAINS one in-engine: k rounds of full-batch
# gradient descent on three SQL-expressible features, the high-resource
# -language proxy label (lang == 'en'), and a weight vector that is
# rounded to 6 decimals at every round boundary so the unrolled DuckDB
# twin tracks the exact same trajectory (the kmeans/BPE determinism
# pattern: FP noise is clipped before it can compound).
_LR_ITERS = 3


def _lr_quality_oracle() -> str:
    from etl_orders_spark.plans.text_queries import (
        _N_TOKENS,
        _PUNCT_RATIO,
        _STOP_RATIO,
    )

    sql = f"""
    WITH feat AS MATERIALIZED (
      SELECT doc_id,
             ln(1.0 + {_N_TOKENS}) AS x1,
             {_PUNCT_RATIO} AS x2,
             {_STOP_RATIO} AS x3,
             CASE WHEN COALESCE(lang, '') = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM (SELECT doc_id, COALESCE(text, '') AS text, lang FROM documents)
    ), w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    for i in range(1, _LR_ITERS + 1):
        p = "1.0 / (1.0 + exp(-(b + w1*x1 + w2*x2 + w3*x3)))"
        sql += f""", g{i} AS (
      SELECT AVG(p - y) AS gb, AVG((p - y) * x1) AS g1,
             AVG((p - y) * x2) AS g2, AVG((p - y) * x3) AS g3
      FROM (SELECT y, x1, x2, x3, {p} AS p FROM feat, w{i - 1})
    ), w{i} AS MATERIALIZED (
      SELECT ROUND(b - gb, 6) AS b, ROUND(w1 - g1, 6) AS w1,
             ROUND(w2 - g2, 6) AS w2, ROUND(w3 - g3, 6) AS w3
      FROM w{i - 1}, g{i}
    ), o{i} AS (
      SELECT CAST({i} AS BIGINT) AS it,
             b AS w_bias, w1 AS w_logtok, w2 AS w_punct, w3 AS w_stop,
             (SELECT CAST(COUNT(*) FILTER (
                WHERE ((b + w1*x1 + w2*x2 + w3*x3) > 0) = (y = 1.0)
              ) AS BIGINT) FROM feat, w{i}) AS n_correct
      FROM w{i}
    )"""
    picks = " UNION ALL ".join(f"SELECT * FROM o{i}" for i in range(1, _LR_ITERS + 1))
    return sql + "\n    " + picks


@register(
    "logreg_quality_train_docs",
    _lr_quality_oracle(),
    tags=("curation", "quality", "llm", "iterative", "ml"),
)
def logreg_quality_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression quality classifier IN-ENGINE: {K}
    rounds of full-batch gradient descent (lr = 1) on three cheap
    prose features — ln(1 + token count), punctuation ratio, stopword
    ratio — against the high-resource-language proxy label
    (lang == 'en'), the label CCNet-class pipelines bootstrap quality
    filters from when no human labels exist. Output per round: the
    weight vector (rounded to 6 decimals — the round boundary is the
    determinism clip that keeps the unrolled DuckDB twin on the exact
    same trajectory) and the INTEGER count of correctly-classified
    docs, so the oracle certifies both the learned model and its
    training-set fit with no FP surface beyond the clipped weights.

    Plan shape at 100 TB: features are one narrow map over the corpus,
    computed ONCE and checkpointed; each GD round is a single
    map-side-combined AVG aggregation (4 doubles of state per
    partition) plus a broadcast of the 1-row weight vector — the
    classic data-parallel distributed-LR layout where the shuffle
    carries only per-partition partial sums, never rows. The driver
    sees k 1-row weight vectors; scoring the trained model over the
    corpus is the same broadcast + map with no aggregation at all."""
    from etl_orders_spark.functions.text import punct_ratio, stopword_ratio, token_count

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
    )
    feat = docs.select(
        "doc_id",
        F.log(F.lit(1.0) + token_count("text").cast("double")).alias("x1"),
        punct_ratio("text").alias("x2"),
        stopword_ratio("text").alias("x3"),
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    ).localCheckpoint(eager=True)

    w = spark.range(1).select(
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("w1"),
        F.lit(0.0).alias("w2"),
        F.lit(0.0).alias("w3"),
    )
    z = F.col("b") + F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2") + F.col(
        "w3"
    ) * F.col("x3")
    outs = []
    for i in range(1, _LR_ITERS + 1):
        joined = feat.crossJoin(F.broadcast(w))
        e = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        g = joined.agg(
            F.avg(e).alias("gb"),
            F.avg(e * F.col("x1")).alias("g1"),
            F.avg(e * F.col("x2")).alias("g2"),
            F.avg(e * F.col("x3")).alias("g3"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                F.round(F.col("b") - F.col("gb"), 6).alias("b"),
                F.round(F.col("w1") - F.col("g1"), 6).alias("w1"),
                F.round(F.col("w2") - F.col("g2"), 6).alias("w2"),
                F.round(F.col("w3") - F.col("g3"), 6).alias("w3"),
            )
            .localCheckpoint(eager=True)
        )
        acc = feat.crossJoin(F.broadcast(w)).agg(
            F.count(F.when((z > 0) == (F.col("y") == 1.0), 1)).cast("long").alias("n_correct")
        )
        outs.append(
            w.crossJoin(F.broadcast(acc)).select(
                F.lit(i).cast("long").alias("it"),
                F.col("b").alias("w_bias"),
                F.col("w1").alias("w_logtok"),
                F.col("w2").alias("w_punct"),
                F.col("w3").alias("w_stop"),
                "n_correct",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


logreg_quality_train_docs.__doc__ = logreg_quality_train_docs.__doc__.format(K=_LR_ITERS)


# --- C4-style blocklist filter ----------------------------------------------
# The "bad words" gate (Raffel et al. 2020 §2.2 dropped any page
# containing a blocklisted term; every production corpus pipeline
# runs some form of it). Terms live in a tiny table BROADCAST into a
# token-keyed semi-probe — the corpus shuffles nothing; only matched
# (doc, term) hits reach the per-doc rollup. The fixture blocklist
# bans one naturally-rare vocab word plus a synthetic term appended
# to every 40th doc (the planted convention), so both the natural and
# planted branches produce hits at every sf.
_BLOCKLIST = ("dup", "xxbadword")
_BL_PLANT_MOD = 40


def _blocklist_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in _BLOCKLIST)
    return f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % {_BL_PLANT_MOD} = 0
                  THEN text || ' xxbadword' ELSE text END AS text
      FROM documents
    ), bl(term) AS (VALUES {terms}),
    tok AS (
      SELECT doc_id, UNNEST({_LOWER_TOKENS}) AS t FROM corpus
    ), hits AS (
      SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok JOIN bl ON tok.t = bl.term
      GROUP BY 1, 2
    ), per_doc AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_banned_hits,
             array_to_string(list_sort(list(term)), ',') AS banned_terms
      FROM hits GROUP BY doc_id
    )
    SELECT c.doc_id,
           COALESCE(p.n_banned_hits, 0) AS n_banned_hits,
           COALESCE(p.banned_terms, '') AS banned_terms,
           p.doc_id IS NULL AS keep
    FROM corpus c LEFT JOIN per_doc p USING (doc_id)
    """


@register(
    "blocklist_filter_docs",
    _blocklist_oracle(),
    tags=("text", "curation", "filter", "llm"),
    bench=True,  # VERDICT r10 #5
)
def blocklist_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate: drop (flag) any document whose token
    stream contains a blocklisted term; report hit counts and the
    sorted distinct terms per flagged doc, keep = no hits. 100 TB
    posture: the blocklist is broadcast (it is KBs even for real
    lists), the token explode is a pure map feeding a broadcast-hash
    semi-probe, and only matched hits — a vanishing fraction — reach
    the doc-keyed rollup; the final verdict join is doc-keyed against
    the corpus ids. For phrase-grain entries the same plan runs over
    the n-gram stream the dup-span lane already emits. Reference
    parity: no counterpart in manliot/ETL-orders (SURVEY §2.8
    build-out; public algorithm: Raffel et al. 2020 C4 §2.2)."""
    from etl_orders_spark.functions.text import normalize_text
    from etl_orders_spark.functions.text import tokens as _tokens

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % _BL_PLANT_MOD == 0,
            F.concat(F.col("text"), F.lit(" xxbadword")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    bl = spark.createDataFrame([(t,) for t in _BLOCKLIST], "term string")
    tok = docs.select(
        "doc_id", F.explode(_tokens(F.lower(normalize_text(F.col("text"))))).alias("t")
    )
    hits = (
        tok.join(F.broadcast(bl), tok.t == bl.term)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    per_doc = hits.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_banned_hits"),
        F.array_join(F.array_sort(F.collect_list("term")), ",").alias("banned_terms"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_banned_hits", F.lit(0).cast("long")).alias("n_banned_hits"),
            F.coalesce("banned_terms", F.lit("")).alias("banned_terms"),
            F.col("n_banned_hits").isNull().alias("keep"),
        )
    )

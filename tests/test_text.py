"""Unit tests for text expressions (tokens/shingles/quality/lang-id)."""

from __future__ import annotations

import math

from etl_orders_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    normalize_text,
    punct_ratio,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
)


def _one(spark, expr, text):
    return spark.createDataFrame([(text,)], "text string").select(expr.alias("v")).collect()[0]["v"]


def test_tokens_empty_and_blank(spark):
    assert _one(spark, tokens("text"), "") == []
    assert _one(spark, tokens("text"), "   ") == []
    assert _one(spark, tokens("text"), "a  b\tc") == ["a", "b", "c"]


def test_token_count(spark):
    assert _one(spark, token_count("text"), "one two three") == 3
    assert _one(spark, token_count("text"), "") == 0


def test_bpe_ish_token_count_segments_words_digits_punct(spark):
    # "ab12!" -> ["ab", "12", "!"]
    assert _one(spark, bpe_ish_token_count("text"), "ab12!") == 3
    # "hello, world" -> ["hello", ",", "world"]
    assert _one(spark, bpe_ish_token_count("text"), "hello, world") == 3
    assert _one(spark, bpe_ish_token_count("text"), "don't stop") == 4


def test_normalize_collapses_case_and_whitespace(spark):
    assert _one(spark, normalize_text("text"), "  A   B\t c ") == "a b c"


def test_fingerprint_equal_for_trivial_variants(spark):
    a = _one(spark, fingerprint("text"), "Hello   World")
    b = _one(spark, fingerprint("text"), "hello world")
    c = _one(spark, fingerprint("text"), "hello worlds")
    assert a == b and a != c


def test_shingles_short_text_empty(spark):
    assert _one(spark, shingles("text", 3), "one two") == []
    assert _one(spark, shingles("text", 3), "") == []


def test_shingles_grams_and_distinct(spark):
    out = _one(spark, shingles("text", 3), "a b c d")
    assert out == ["a b c", "b c d"]
    # repeated grams dedupe
    out = _one(spark, shingles("text", 2), "x y x y")
    assert sorted(out) == ["x y", "y x"]


def test_shingles_k2(spark):
    assert _one(spark, shingles("text", 2), "a b c") == ["a b", "b c"]


def test_punct_ratio(spark):
    assert _one(spark, punct_ratio("text"), "") == 0.0
    assert math.isclose(_one(spark, punct_ratio("text"), "ab!!"), 0.5)


def test_stopword_ratio(spark):
    assert math.isclose(_one(spark, stopword_ratio("text"), "the cat"), 0.5)
    assert _one(spark, stopword_ratio("text"), "") == 0.0


def test_lang_id_basic(spark):
    assert _one(spark, lang_id("text"), "the cat and the hat of a dog") == "en"
    assert _one(spark, lang_id("text"), "el perro de la casa que ladra") == "es"
    assert _one(spark, lang_id("text"), "le chat et les chiens des rues") == "fr"
    assert _one(spark, lang_id("text"), "der hund und die katze das haus") == "de"
    assert _one(spark, lang_id("text"), "xyzzy plugh") == "und"


def test_lang_id_tie_breaks_by_language_order(spark):
    # 'la' is a marker for both es and fr; es wins the tie by fixed order
    assert _one(spark, lang_id("text"), "la") == "es"
    # 'de' is es and de marker; es precedes de
    assert _one(spark, lang_id("text"), "de") == "es"


def test_pii_redaction_on_planted_fixtures(spark):
    """Emails/phones planted in free text are detected and redacted;
    clean text passes through byte-identical."""
    from etl_orders_spark.functions.privacy import pii_counts, redact_pii

    rows = [
        (1, "contact Jo.Smith+spam@ex-ample.co.uk or +1 (415) 555-0199 now"),
        (2, "two mails a@b.io c.d@e.org and a phone 0049 30 1234567"),
        (3, "no pii here, just words and numbers like 42"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    ne, np_ = pii_counts("txt")
    got = {
        r["id"]: (r["red"], r["ne"], r["np"])
        for r in df.select(
            "id", redact_pii("txt").alias("red"), ne.alias("ne"), np_.alias("np")
        ).collect()
    }
    assert got[1] == ("contact <EMAIL> or <PHONE> now", 1, 1)
    assert got[2] == ("two mails <EMAIL> <EMAIL> and a phone <PHONE>", 2, 1)
    assert got[3] == ("no pii here, just words and numbers like 42", 0, 0)
    assert got[4] == ("", 0, 0)


def test_pseudonym_stability_and_masking(spark):
    from etl_orders_spark.functions.privacy import mask_digits, pseudonym

    df = spark.createDataFrame([(7, "Customer#000000007")], "k long, name string")
    r1 = df.select(pseudonym("k", "s1").alias("p"), mask_digits("name").alias("m")).collect()[0]
    r2 = df.select(pseudonym("k", "s1").alias("p")).collect()[0]
    r3 = df.select(pseudonym("k", "s2").alias("p")).collect()[0]
    assert r1["p"] == r2["p"] and r1["p"] != r3["p"]  # stable per salt, broken across salts
    assert r1["m"] == "Customer##########"


class TestStripHtml:
    def _one(self, spark, raw: str) -> str:
        from etl_orders_spark.functions.text import strip_html

        return spark.createDataFrame([(raw,)], "t string").select(
            strip_html("t").alias("s")
        ).collect()[0].s

    def test_tags_become_word_boundaries(self, spark):
        assert self._one(spark, "<p>alpha</p><p>beta</p>") == "alpha beta"

    def test_script_and_style_content_dropped(self, spark):
        raw = "<html><style>p{color:red}</style>keep<script>var x=1;</script>me</html>"
        assert self._one(spark, raw) == "keep me"

    def test_comments_and_entities(self, spark):
        raw = "a <!-- hidden --> b &amp; c &lt;tag&gt; &quot;q&quot; &#39;s&#39;"
        assert self._one(spark, raw) == "a b & c <tag> \"q\" 's'"

    def test_double_escaped_amp_stays_literal(self, spark):
        # '&amp;lt;' is the TEXT '&lt;' — decoding &amp; last keeps it that way
        assert self._one(spark, "x &amp;lt; y") == "x &lt; y"

    def test_decoded_angle_is_not_a_tag(self, spark):
        assert self._one(spark, "&lt;b&gt;not bold&lt;/b&gt;") == "<b>not bold</b>"

    def test_plain_text_unchanged(self, spark):
        assert self._one(spark, "  just   text  ") == "just text"


def test_zipf_slope_negative_and_sane(spark, sf_dir):
    from etl_orders_spark.plans.registry import query_map

    r = query_map()["zipf_slope_corpus"](spark, sf_dir).collect()[0]
    # rank-frequency slope must be negative; natural-ish text sits
    # between -2 and -0.2 (the synthetic corpus is flatter than prose)
    assert -2500 < r.zipf_slope_milli < -100
    assert r.n_terms > 20  # sf0.001 fixture has a tiny vocabulary


def test_lexical_diversity_bounds_and_edges(spark):
    import etl_orders_spark.plans.text_queries as TQ

    df = spark.createDataFrame(
        [
            (1, "the the the the"),          # one type, four tokens -> 250
            (2, "all words are unique here"),  # ttr 1000
            (3, ""),                           # empty -> 0 tokens, ttr 0
        ],
        "doc_id long, text string",
    )
    orig = TQ.T
    TQ.T = lambda spark_, sf_, name: df  # noqa: E731
    try:
        got = {r.doc_id: (r.n_tokens, r.n_types, r.ttr_milli)
               for r in TQ.lexical_diversity_docs(spark, "unused").collect()}
    finally:
        TQ.T = orig
    assert got[1] == (4, 1, 250)
    assert got[2] == (5, 5, 1000)
    assert got[3] == (0, 0, 0)


def test_doc_keywords_exclude_ubiquitous_terms(spark, sf_dir):
    from collections import Counter

    from etl_orders_spark.plans.registry import query_map

    rows = query_map()["doc_keywords_tfidf"](spark, sf_dir).collect()
    assert rows
    per_doc = Counter(r.doc_id for r in rows)
    assert max(per_doc.values()) <= 3
    for r in rows:
        assert r.score_micro > 0 and 1 <= r.rank <= 3


def test_threshold_sweep_accounts_for_registered_pairs(spark, sf_dir):
    """Pairs at or above the registered τ=0.2 threshold must equal the
    sweep's mass in buckets >= 4 (0.2 = bucket 4 boundary, both exact)."""
    from etl_orders_spark.plans.registry import query_map

    q = query_map()
    sweep = q["dedup_threshold_sweep"](spark, sf_dir).collect()
    high = sum(r.n_pairs for r in sweep if r.bucket_5pct >= 4)
    registered = q["ngram_jaccard_pairs"](spark, sf_dir).count()
    assert high == registered
    assert all(0 <= r.bucket_5pct <= 20 for r in sweep)


def test_bpe_merge_pairs_vocab_collapse_equals_direct_count(spark, sf_dir):
    """The vocab-collapse trick must be invisible in the result: pair
    counts weighted by word frequency equal the brute-force count over
    every word occurrence in the corpus."""
    from collections import Counter

    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.sources.readers import load_table

    out = query_map()["bpe_merge_pairs"](spark, sf_dir).collect()
    assert out and all(len(r.pair) == 2 and r.pair_count > 0 for r in out)

    texts = [r.text for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    direct = Counter()
    for t in texts:
        for w in t.lower().split():
            for i in range(len(w) - 1):
                direct[w[i : i + 2]] += 1
    expect = sorted(direct.items(), key=lambda kv: (-kv[1], kv[0]))[: len(out)]
    got = [(r.pair, r.pair_count) for r in out]
    assert got == expect


def test_word_bigrams_guards_short_docs(spark):
    """<2-token inputs must yield an EMPTY bigram array, not a crash:
    Spark's sequence(1, 0) descends, so the naive position-sequence
    form throws element_at(t, 0) on blank or single-token docs."""
    from pyspark.sql import functions as F

    from etl_orders_spark.functions.text import tokens, word_bigrams

    df = spark.createDataFrame(
        [("",), ("  ",), ("one",), ("two words",), ("a b c",)], ["text"]
    )
    rows = df.select(word_bigrams(tokens(F.col("text"))).alias("bg")).collect()
    assert [r.bg for r in rows] == [[], [], [], ["two words"], ["a b", "b c"]]


def test_quality_and_lang_null_text_behaves_as_empty(spark):
    """NULL text must score like EMPTY text (0.3) and classify 'und' —
    not the 0.7 / 'de' a NULL would get from least()'s NULL-skipping
    and a when-chain's NULL fall-through. The SQL twins (_QUALITY,
    _lang_case_sql) carry the matching explicit NULL branch."""
    from pyspark.sql import functions as F

    from etl_orders_spark.functions.text import lang_id, quality_score

    df = spark.createDataFrame([(None,), ("",)], "text string")
    rows = df.select(
        quality_score("text").alias("q"), lang_id("text").alias("l")
    ).collect()
    assert [(r.q, r.l) for r in rows] == [(0.3, "und"), (0.3, "und")]


def test_quality_lang_gate_matches_composed_filter(spark):
    """quality_lang_gate (the llm_prep single-tokenize gate) must equal
    floor(quality_score*10000) >= mq*10000 AND lang_id == lang
    row-for-row — including NULL/empty text, marker ties, and a
    ratio that lands exactly on a 4-decimal floor boundary."""
    from pyspark.sql import functions as F

    from etl_orders_spark.functions.text import (
        lang_id,
        quality_lang_gate,
        quality_score,
    )

    rows = [
        (None,),
        ("",),
        ("   ",),
        ("the and of to a " * 40,),                      # strong en
        ("el la de que los " * 40,),                     # strong es
        ("the el la and de que" * 10,),                  # cross-language tie
        ("x " * 7 + "the " * 25,),                       # 7/32-style ratios
        ("!!! ??? ***",),                                # punctuation soup
        ("the quick brown fox jumps over the lazy dog " * 12,),
        ("le la et les des " * 40,),                     # fr
        ("der die und das ein " * 40,),                  # de
    ]
    df = spark.createDataFrame(rows, "text string")
    for mq, lang in ((0.5, "en"), (0.3, "es"), (0.0, "und")):
        composed = (
            (F.floor(quality_score("text") * 10000) >= mq * 10000)
            & (lang_id("text") == lang)
        )
        got = df.select(
            F.coalesce(quality_lang_gate("text", mq, lang), F.lit(False)).alias("g"),
            F.coalesce(composed, F.lit(False)).alias("c"),
        ).collect()
        assert [r.g for r in got] == [r.c for r in got], (mq, lang)

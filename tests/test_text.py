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

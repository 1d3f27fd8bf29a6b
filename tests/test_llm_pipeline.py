"""End-to-end LLM corpus-prep pipeline semantics."""

from __future__ import annotations

from etl_orders_spark.plans.llm_pipeline import prep_corpus


def test_prep_corpus_stages(spark):
    good = "the cat and the dog sat of the mat and the hat came to a rest " * 8
    rows = [
        (1, good),                      # survives everything
        (2, good.upper()),              # exact dup of 1 after normalize -> dropped
        (3, good + "extra tail words"), # near-dup of 1 (high jaccard) -> dropped (higher id)
        (4, "el perro de la casa que ladra mucho y los gatos de la calle " * 8),  # wrong lang
        (5, "x"),                       # fails quality
        (6, "the quick brown fox jumps over the lazy dog and the cat watches of a to and " * 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_tokens"] for r in prep_corpus(df).collect()}
    assert set(out) == {1, 6}
    assert out[1] == len(good.split())


def test_prep_corpus_idempotent(spark):
    """Running prep over an already-prepped corpus changes nothing."""
    rows = [
        (1, "the cat and the dog sat of the mat and the hat came to a rest " * 8),
        (6, "the quick brown fox jumps over the lazy dog and the cat watches of a to and " * 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = sorted(map(tuple, prep_corpus(df).collect()))
    assert sorted(map(tuple, prep_corpus(df).collect())) == once
    assert len(once) == 2

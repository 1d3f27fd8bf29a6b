"""UDF registry surface (SURVEY.md §2.6): native tier + pandas tier."""

from __future__ import annotations

import math

import pytest

from etl_orders_spark.functions.registry import (
    EXPRESSIONS,
    expression,
    register_pandas_udfs,
)


def test_expression_lookup_and_unknown(spark):
    assert expression("token_count") is EXPRESSIONS["token_count"]
    with pytest.raises(KeyError, match="unknown expression"):
        expression("nope")


def test_native_expressions_compose(spark):
    df = spark.createDataFrame([("the cat and the hat",)], "text string")
    out = df.select(
        expression("token_count")("text").alias("n"),
        expression("lang_id")("text").alias("lang"),
        expression("fingerprint")("text").alias("fp"),
    ).collect()[0]
    assert out["n"] == 5 and out["lang"] == "en" and len(out["fp"]) == 32


def test_pandas_udfs_from_sql_and_dataframe(spark):
    udfs = register_pandas_udfs(spark)
    df = spark.createDataFrame([(b"\x00\xff\x00\xff",), (b"",)], "content binary")
    rows = df.select(udfs["byte_entropy"]("content").alias("e"),
                     udfs["mean_byte"]("content").alias("m")).collect()
    assert math.isclose(rows[0]["e"], 1.0)  # two symbols, uniform -> 1 bit
    assert math.isclose(rows[0]["m"], 127.5)
    assert rows[1]["e"] == 0.0 and rows[1]["m"] == 0.0
    # SQL-callable by registered name
    df.createOrReplaceTempView("blobs")
    got = spark.sql("SELECT byte_entropy(content) AS e FROM blobs").collect()
    assert math.isclose(got[0]["e"], 1.0)

"""Schema evolution: conform_to_schema's contract and the evolved
parquet scan (sources/evolution.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_orders_spark.sources.evolution import conform_to_schema, read_parquet_evolved

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("status", T.StringType()),
    ]
)


def test_conform_fills_missing_column_with_typed_null_in_target_order(spark):
    df = spark.createDataFrame([(1.5, 7)], "v float, id int")  # reversed order, narrow types
    out = conform_to_schema(df, TARGET)
    assert [f.name for f in out.schema.fields] == ["id", "v", "status"]
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(),
        T.DoubleType(),
        T.StringType(),
    ]
    row = out.collect()[0]
    assert (row["id"], row["v"], row["status"]) == (7, 1.5, None)


def test_conform_rejects_lossy_narrowing_and_names_the_column(spark):
    df = spark.createDataFrame([(1, 1.0, "O")], "id long, v double, status string")
    narrow = T.StructType([T.StructField("id", T.IntegerType())])
    with pytest.raises(ValueError, match="'id'.*not a safe widening"):
        conform_to_schema(df, narrow)


def test_conform_extra_columns_drop_or_error(spark):
    df = spark.createDataFrame([(1, 2.0, "O", "junk")], "id long, v double, status string, x string")
    assert conform_to_schema(df, TARGET).columns == ["id", "v", "status"]
    with pytest.raises(ValueError, match=r"\['x'\]"):
        conform_to_schema(df, TARGET, on_extra="error")


def test_evolved_scan_unions_generations_with_widening(spark, tmp_path):
    """gen1 predates `status` and carries int ids; gen2 added the
    column and widened the id — one conformed relation, no rewrite of
    gen1, NULLs exactly on the pre-column rows."""
    g1, g2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, v double").write.parquet(g1)
    spark.createDataFrame([(3, 30.0, "F")], "id long, v double, status string").write.parquet(g2)
    out = read_parquet_evolved(spark, [g1, g2], target=TARGET)
    rows = {r["id"]: (r["v"], r["status"]) for r in out.collect()}
    assert rows == {1: (10.0, None), 2: (20.0, None), 3: (30.0, "F")}
    assert out.schema == TARGET


def test_evolved_scan_without_target_merges_column_adds(spark, tmp_path):
    g1, g2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1,)], "id long").write.parquet(g1)
    spark.createDataFrame([(2, "X")], "id long, status string").write.parquet(g2)
    out = read_parquet_evolved(spark, [g1, g2])
    got = {(r["id"], r["status"]) for r in out.collect()}
    assert got == {(1, None), (2, "X")}


def test_schema_diff_classifies_every_change_kind():
    from etl_orders_spark.sources.evolution import schema_diff

    old = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("gone", T.StringType()),
            T.StructField("flip", T.LongType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("id", T.LongType()),       # widened
            T.StructField("v", T.DoubleType()),      # unchanged
            T.StructField("status", T.StringType()), # added
            T.StructField("flip", T.IntegerType()),  # NARROWED -> incompatible
        ]
    )
    d = schema_diff(old, new)
    assert d["added"] == ["status"]
    assert d["removed"] == ["gone"]
    assert d["widened"] == ["id: int -> bigint"]
    assert d["incompatible"] == ["flip: bigint -> int"]

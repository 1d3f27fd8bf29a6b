"""Tests for the S7 synthetic generator (domains per FIXTURES.md §A)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_orders_spark.sources.generator import (
    gen_orders,
    gen_products,
    gen_user_info,
    gen_users,
)


def test_orders_domains(spark):
    o = gen_orders(spark, 1000)
    stats = o.agg(
        F.min("Fecha").alias("f0"), F.max("Fecha").alias("f1"),
        F.min("Product_ID").alias("p0"), F.max("Product_ID").alias("p1"),
        F.min("User_ID").alias("u0"), F.max("User_ID").alias("u1"),
    ).collect()[0]
    assert stats["f0"] >= "2024-04-01" and stats["f1"] <= "2024-04-07"
    assert 1 <= stats["p0"] and stats["p1"] <= 10
    assert 1 <= stats["u0"] and stats["u1"] <= 100


def test_orders_deterministic_for_seed(spark):
    a = gen_orders(spark, 100, seed=5).collect()
    b = gen_orders(spark, 100, seed=5).collect()
    assert a == b
    c = gen_orders(spark, 100, seed=6).collect()
    assert a != c


def test_products_ids_2_to_8(spark):
    p = gen_products(spark)
    assert [r["Id"] for r in p.orderBy("Id").collect()] == [2, 3, 4, 5, 6, 7, 8]
    assert p.filter((F.col("Price") < 1000) | (F.col("Price") > 100000)).count() == 0


def test_users_bijection(spark):
    u = gen_users(spark)
    assert u.count() == 300
    assert u.select("Document").distinct().count() == 300
    first = u.orderBy("Id").first()
    assert (first["Id"], first["Document"]) == (1, 300000)


def test_user_info_superset_and_dirty_gender(spark):
    info = gen_user_info(spark)
    assert info.count() == 500
    docs = info.agg(F.min("document"), F.max("document")).collect()[0]
    assert docs[0] == 300000 and docs[1] == 300499
    genders = {r["gender"] for r in info.select("gender").distinct().collect()}
    assert genders == {"M", "F", "Male", "f", "Other"}  # all dirty variants present
    assert info.filter(~F.col("birthday").endswith("T00:00:00")).count() == 0

"""Profiling single-pass operator + grouped-map/native twin equality."""

from __future__ import annotations

import math

import pytest

from etl_orders_spark.operators.grouped_map import zscore_by_group, zscore_by_group_native
from etl_orders_spark.operators.profile import profile_columns
from etl_orders_spark.sources.readers import load_table


def test_profile_metrics_correct(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "a"), (3, 30.0, None), (4, 10.0, "b")],
        "id long, x double, s string",
    )
    out = {(r["col_name"], r["metric"]): r["value"] for r in
           profile_columns(df, numeric_cols=["x"], string_cols=["s"]).collect()}
    assert out[("x", "n_null")] == 1.0
    assert out[("x", "n_distinct")] == 2.0  # 10.0 and 30.0
    assert out[("x", "min")] == 10.0 and out[("x", "max")] == 30.0
    assert math.isclose(out[("x", "avg")], 50.0 / 3, abs_tol=1e-4)
    assert out[("s", "n_null")] == 1.0 and out[("s", "n_distinct")] == 2.0


def test_profile_is_single_aggregate_job(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, x double")
    plan = profile_columns(df, numeric_cols=["x"])._jdf.queryExecution().executedPlan().toString()
    # one aggregate, then a generate/project for the unpivot - no join of sub-profiles
    assert "Join" not in plan


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_grouped_map_matches_native_zscore(docs):
    a = {r["doc_id"]: r["z"] for r in zscore_by_group(docs).collect()}
    b = {r["doc_id"]: r["z"] for r in zscore_by_group_native(docs).collect()}
    assert a.keys() == b.keys()
    assert all(math.isclose(a[k], b[k], abs_tol=1e-9) for k in a)


def test_zscore_constant_group_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "x", 100), (2, "x", 100), (3, "y", 7)], "doc_id long, lang string, n_chars long"
    )
    out = {r["doc_id"]: r["z"] for r in zscore_by_group(df).collect()}
    assert out == {1: 0.0, 2: 0.0, 3: 0.0}  # zero variance -> 0, never NaN

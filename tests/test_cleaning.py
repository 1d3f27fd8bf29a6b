"""Unit tests for value-normalization expressions (SURVEY.md §2.2).

Edge cases drawn from the reference's dirty domains: gender variants
{M, F, Male, f, Other} (reference: dags/etl.py:60) and T-suffixed ISO
timestamps (reference: dags/etl.py:63-64).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_orders_spark.functions.cleaning import clean_priority, recode, truncate_iso_date


def _vals(spark, expr, rows, schema="v string"):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr).collect()]


def test_recode_maps_and_passes_through(spark):
    rows = [("Male",), ("f",), ("M",), ("F",), ("Other",), (None,)]
    out = _vals(spark, recode("v", {"Male": "M", "f": "F"}), rows)
    assert out == ["M", "F", "M", "F", "Other", None]


def test_recode_no_passthrough_yields_null(spark):
    out = _vals(spark, recode("v", {"a": "x"}, default_passthrough=False), [("a",), ("b",)])
    assert out == ["x", None]


def test_recode_empty_mapping_is_identity(spark):
    out = _vals(spark, recode("v", {}), [("z",)])
    assert out == ["z"]


def test_recode_is_full_value_not_substring(spark):
    # the reference's .replace() would also hit substrings; ours must not
    out = _vals(spark, recode("v", {"Male": "M"}), [("Malecon",)])
    assert out == ["Malecon"]


def test_truncate_iso_date(spark):
    rows = [("1967-02-20T00:00:00",), ("2006-12-12T23:59:59",), ("1990-01-01",), ("",)]
    out = _vals(spark, truncate_iso_date("v"), rows)
    assert out == ["1967-02-20", "2006-12-12", "1990-01-01", ""]


def test_clean_priority(spark):
    out = _vals(spark, clean_priority("v"), [("1-URGENT",), ("5-LOW",), ("PLAIN",)])
    assert out == ["URGENT", "LOW", "PLAIN"]


def test_recode_composes_in_groupby(spark):
    df = spark.createDataFrame([("Male",), ("M",), ("f",)], "g string")
    out = {
        r["g"]: r["n"]
        for r in df.groupBy(recode("g", {"Male": "M", "f": "F"}).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {"M": 2, "F": 1}

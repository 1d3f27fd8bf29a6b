"""Z-order layout: content preservation + the pruning claim itself.

The pruning assertion reads the actual parquet row-group statistics
(via DuckDB's parquet_metadata) and measures the clustering factor —
mean per-row-group (max-min)/global-range. A random layout scores ~1
on every column; a single-column sort scores ~1/n_files on that column
and ~1 on the others; Z-order must land well below 1 on BOTH
participating columns simultaneously, which is the property that makes
multi-predicate scans prune at 100 TB.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_orders_spark.operators.layout import zorder_by
from etl_orders_spark.sources.readers import load_table

# power of 4 so the Morton key's top log2(n) bits cut BOTH dims equally
# (at 8 files one dim gets two cuts and the other one -> 0.5 expected range)
_N_FILES = 16


def _clustering_factor(path: str, col: str) -> float:
    """Mean (max-min)/global_range over row groups, from parquet stats."""
    q = f"""
    WITH rg AS (
      SELECT CAST(stats_min_value AS DOUBLE) AS mn, CAST(stats_max_value AS DOUBLE) AS mx
      FROM parquet_metadata('{path}/*.parquet')
      WHERE path_in_schema = '{col}'
    )
    SELECT AVG((mx - mn) / NULLIF((SELECT MAX(mx) - MIN(mn) FROM rg), 0)) FROM rg
    """
    return duckdb.sql(q).fetchone()[0]


def test_zorder_preserves_content_and_tightens_both_dims(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )

    base = str(tmp_path / "plain")
    zpath = str(tmp_path / "zorder")
    # shuffle randomly-ish first so the baseline isn't accidentally sorted
    li.repartition(_N_FILES, "l_orderkey").write.mode("overwrite").parquet(base)
    zorder_by(li, ["l_partkey", "l_suppkey"], n_files=_N_FILES).write.mode(
        "overwrite"
    ).parquet(zpath)

    a, b = spark.read.parquet(base), spark.read.parquet(zpath)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.schema == b.schema

    for col in ("l_partkey", "l_suppkey"):
        cf_plain = _clustering_factor(base, col)
        cf_z = _clustering_factor(zpath, col)
        # random layout stays near full-range; z-order must tighten BOTH dims
        assert cf_plain > 0.8, f"{col}: baseline unexpectedly clustered ({cf_plain})"
        assert cf_z < 0.55, f"{col}: z-order clustering factor {cf_z}"
        assert cf_z < cf_plain * 0.6, f"{col}: {cf_z} vs plain {cf_plain}"


def test_zorder_handles_constant_and_single_row(spark, tmp_path):
    """A constant column (span 0) must bucket to 0 everywhere instead of
    dividing by zero, and a single-row frame must survive the
    range-partition path."""
    df = spark.createDataFrame(
        [(i, 7, i % 3) for i in range(50)], "a long, const long, b long"
    )
    out = zorder_by(df, ["a", "const", "b"], n_files=4)
    assert out.count() == 50
    assert out.columns == ["a", "const", "b"]  # helper columns dropped

    one = spark.createDataFrame([(1, 2)], "a long, b long")
    assert zorder_by(one, ["a", "b"], n_files=2).count() == 1

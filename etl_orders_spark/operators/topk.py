"""Top-k per group as a reusable operator."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, group: list[str], order: list[Column], k: int) -> DataFrame:
    """row_number ≤ k within each group. Callers must make `order`
    deterministic (include a unique key last). Spark runs this as one
    shuffle on the group key + in-partition sort; with AQE, skewed
    groups split. For global top-k use orderBy().limit() instead —
    that plans TakeOrderedAndProject (per-partition heaps, no shuffle)."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")

"""Snapshot diff: typed change capture between two table versions.

The missing half of the MERGE/SCD2 family (operators/merge.py): given
yesterday's and today's snapshot of a keyed table, emit one row per
changed key tagged `insert` / `delete` / `update`, plus which columns
changed — the change feed a downstream incremental pipeline consumes
instead of reprocessing the full table.

Plan shape: one full-outer join on the key (both sides shuffle on it —
co-partitionable, AQE-planned; at 100 TB snapshots should be bucketed
on the key so the diff is zero-Exchange), then pure map-side
comparison. Null-safe equality (`eqNullSafe`) so NULL→value and
value→NULL both count as changes and NULL==NULL does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows: key columns + change_type ('insert'|'delete'|'update') +
    changed_cols (sorted array of column names, empty for
    insert/delete). Unchanged keys are dropped. `compare_cols` defaults
    to all shared non-key columns."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]

    o = old.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_k_{k}") for k in key_cols],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, [f"_k_{k}" for k in key_cols], "full_outer")

    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(
                F.col("change_type") == "update", changed
            ).otherwise(F.array().cast("array<string>")),
        )
        .select(
            *[F.col(f"_k_{k}").alias(k) for k in key_cols],
            "change_type",
            "changed_cols",
        )
    )

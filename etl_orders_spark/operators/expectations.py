"""Data-quality expectations: declarative checks, one scan per table.

The reference pipeline loads whatever arrives (reference:
dags/etl.py:41-66 — no validation anywhere); a production warehouse
gates loads on expectations. This operator family evaluates a list of
row-level checks (not-null, range, set membership, regexp) in ONE
conditional aggregate over the table — violation counting costs a
single scan regardless of how many checks run — plus key-level checks
(uniqueness via count vs distinct in the same pass) and referential
integrity (a broadcast anti-join per foreign key). Output is long-form
`(check, violations, total)` so a gate is just `violations == 0`.

At 100 TB: row checks are a map stage feeding one constant-size
aggregate; RI anti-joins broadcast the dimension key set; nothing
materializes violating rows (use `violating_rows` explicitly for
debugging samples — that one IS a filter scan).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    predicate: Column  # True => row PASSES


def not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNotNull())


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(f"in_range:{col}", F.col(col).between(lo, hi))


def in_set(col: str, allowed: list[str]) -> Check:
    return Check(f"in_set:{col}", F.col(col).isin(allowed))


def matches(col: str, pattern: str) -> Check:
    return Check(f"matches:{col}", F.col(col).rlike(pattern))


def run_row_checks(df: DataFrame, checks: list[Check], unique_keys: list[str] | None = None) -> DataFrame:
    """All row-level checks + key uniqueness in one aggregate pass.
    A NULL predicate result (e.g. a range check on a NULL value) counts
    as a violation — checks are pass-affirmative."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    names: list[str] = []
    for c in checks:
        # coalesce: SUM over an EMPTY frame is NULL, and a NULL
        # violations count neither passes nor fails a `== 0` gate —
        # an empty-but-clean load must gate as clean (0)
        aggs.append(
            F.coalesce(F.sum(F.when(c.predicate, 0).otherwise(1)), F.lit(0))
            .cast("long")
            .alias(f"_v_{len(names)}")
        )
        names.append(c.name)
    for k in unique_keys or []:
        aggs.append((F.count(k) - F.count_distinct(F.col(k))).cast("long").alias(f"_v_{len(names)}"))
        names.append(f"unique:{k}")
    wide = df.agg(*aggs)
    pairs = [
        F.struct(F.lit(n).alias("check"), F.col(f"_v_{i}").alias("violations"))
        for i, n in enumerate(names)
    ]
    return wide.select(
        F.explode(F.array(*pairs)).alias("p"), F.col("_total").cast("long").alias("total")
    ).select("p.check", "p.violations", "total")


def ref_integrity(fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
    """Orphan count for fact.fk against dim.pk, as one long-form row.
    The dim key set broadcasts; the fact side never shuffles and is
    scanned ONCE — a left join marks hits and a conditional aggregate
    counts orphans and total together."""
    keys = dim.select(F.col(pk).alias(fk)).distinct().withColumn("_hit", F.lit(True))
    return (
        fact.select(fk)
        .join(F.broadcast(keys), fk, "left")
        .agg(
            F.count_if(F.col("_hit").isNull()).cast("long").alias("violations"),
            F.count(F.lit(1)).cast("long").alias("total"),
        )
        .select(F.lit(f"ref:{fk}->{pk}").alias("check"), "violations", "total")
    )


def violating_rows(df: DataFrame, check: Check) -> DataFrame:
    """Debug helper: the rows failing one check (full filter scan)."""
    return df.filter(~F.coalesce(check.predicate, F.lit(False)))

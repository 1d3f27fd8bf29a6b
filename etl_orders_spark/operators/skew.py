"""Skew mitigation: salted joins for hot keys.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the plan-level
fallback for pathological key distributions (one key = 30% of a
100 TB fact table): the big side spreads each key over `n_salts`
shuffle partitions via a deterministic salt; the small side replicates
each row `n_salts` times so every salted partition finds its match.
Cost: small side × n_salts; benefit: the hot key's work parallelizes
n_salts-ways instead of landing on one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted `n_salts` ways.

    `salt_source` should be an expression over the big side's columns
    that varies per row (default: hash of the key and a per-row
    monotonic id — pass an explicit unique column when a fully
    deterministic plan matters; any salt value yields the same join
    result). Output columns = big ∪ small minus the helper salt
    columns; semantics identical to the unsalted join.
    """
    if salt_source is None:
        salt_source = F.xxhash64(F.col(big_key), F.monotonically_increasing_id())
    b = big.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts)).cast("int"))
    s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    joined = b.join(s, (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]), how)
    return joined.drop("_salt")

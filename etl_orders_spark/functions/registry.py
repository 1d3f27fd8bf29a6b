"""UDF surface (SURVEY.md §2.6) — a thin registry, native-first.

The reference's "UDFs" are whole-table pandas callables wired into
the DAG via PythonOperator (reference: dags/etl.py:196-215). Here the
tiers, fastest first:

1. `EXPRESSIONS` — named Column-expression factories (pure JVM,
   whole-stage codegen). This covers 100% of the reference's logic
   and nearly all engine functions; it is the default surface for
   DataFrame callers.
2. `register_pandas_udfs(spark)` — Arrow-vectorized pandas UDFs for
   the genuinely-Python computations (numpy byte math), registered by
   name so SQL (`SELECT byte_entropy(content) ...`) and `F.expr` can
   call them. Row-at-a-time `F.udf` is deliberately absent: there is
   no operation in this engine that justifies it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_orders_spark.functions import cleaning, text, vectors

# --- tier 1: native Column-expression factories -----------------------------

EXPRESSIONS: dict[str, Callable[..., Column]] = {
    # cleaning (reference analogs: dags/etl.py:60, 63-64)
    "recode": cleaning.recode,
    "truncate_iso_date": cleaning.truncate_iso_date,
    "clean_priority": cleaning.clean_priority,
    # text analysis
    "normalize_text": text.normalize_text,
    "tokens": text.tokens,
    "token_count": text.token_count,
    "bpe_ish_token_count": text.bpe_ish_token_count,
    "punct_ratio": text.punct_ratio,
    "stopword_ratio": text.stopword_ratio,
    "quality_score": text.quality_score,
    "lang_id": text.lang_id,
    "fingerprint": text.fingerprint,
    "shingles": text.shingles,
    # vector math
    "dot": vectors.dot,
    "l2_norm": vectors.l2_norm,
    "cosine_similarity": vectors.cosine_similarity,
}


def expression(name: str) -> Callable[..., Column]:
    """Look up a named expression factory; KeyError lists what exists."""
    try:
        return EXPRESSIONS[name]
    except KeyError:
        raise KeyError(f"unknown expression {name!r}; known: {sorted(EXPRESSIONS)}") from None


# --- tier 2: Arrow pandas UDFs for genuinely-Python computations ------------


def _make_pandas_udfs() -> dict[str, tuple[Callable, T.DataType]]:
    """Build the pandas-UDF implementations as closures: module-level
    functions pickle by reference, which would require the Python
    workers to import this package (fails when the driver cwd isn't
    the repo root)."""

    def byte_entropy_impl(s):
        import numpy as np

        def one(b: bytes | None) -> float:
            if not b:
                return 0.0
            arr = np.frombuffer(b, dtype=np.uint8)
            hist = np.bincount(arr, minlength=256).astype(np.float64)
            p = hist[hist > 0] / arr.size
            return float(-(p * np.log2(p)).sum())

        return s.map(one)

    def mean_byte_impl(s):
        import numpy as np

        return s.map(
            lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if b else 0.0
        )

    return {
        "byte_entropy": (byte_entropy_impl, T.DoubleType()),
        "mean_byte": (mean_byte_impl, T.DoubleType()),
    }


PANDAS_UDFS: dict[str, tuple[Callable, T.DataType]] = _make_pandas_udfs()


def register_pandas_udfs(spark: SparkSession) -> dict[str, Callable[..., Column]]:
    """Register the pandas-UDF tier into the session so SQL text and
    `F.expr` can call them by name; returns the callable columns for
    DataFrame use. Idempotent (re-registering overwrites)."""
    out = {}
    for name, (impl, rtype) in PANDAS_UDFS.items():
        udf = F.pandas_udf(impl, rtype)
        spark.udf.register(name, udf)
        out[name] = udf
    return out

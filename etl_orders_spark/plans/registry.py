"""Query registry: every operator the engine claims, paired with its oracle.

Each entry couples a Spark builder ``(spark, sf_dir) -> DataFrame``
with (when SQL-expressible) an ANSI-SQL twin that DuckDB runs over the
same parquet tables. The driver executes both at sf=0.01 and compares
row-count + schema + order-insensitive value hash — so the pair IS the
correctness contract (SURVEY.md §5.2).

Determinism conventions shared by every pair:
- double aggregates rounded (ROUND(x, 2) both sides) so FP
  accumulation-order noise can't flip the value hash;
- counts/sizes cast to BIGINT both sides (DuckDB sums of integers
  widen to HUGEINT otherwise);
- timestamps reduced to DATE or grouped via epoch-aligned windows;
  session timezone pinned to UTC before every build;
- any top-k / limit ordered by a rounded measure plus a unique key so
  tie-breaking is identical in both engines;
- intermediate columns that an output alias would shadow get
  underscore names (`_mn`): Spark resolves a later select item's
  column reference against EARLIER aliases in the same list (lateral
  column aliases), so `F.round("mn", 6).alias("mn")` silently rebinds
  subsequent `F.col("mn")` to the rounded value.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_orders_spark.session import pin_session_defaults

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => non-SQL-expressible (rows-only check)
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py's headline set


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = (), bench: bool = False
) -> Callable[[Builder], Builder]:
    """Decorator: add a (builder, oracle) pair to the registry."""

    def deco(fn: Builder) -> Builder:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session_defaults(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, builder=wrapped, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def _load_all() -> None:
    """Import every query module for registration side effects."""
    import etl_orders_spark.plans.core_queries  # noqa: F401
    import etl_orders_spark.plans.curation_queries  # noqa: F401
    import etl_orders_spark.plans.dq_queries  # noqa: F401
    import etl_orders_spark.plans.graph_queries  # noqa: F401
    import etl_orders_spark.plans.layout_queries  # noqa: F401
    import etl_orders_spark.plans.linkage_queries  # noqa: F401
    import etl_orders_spark.plans.llm_pipeline  # noqa: F401
    import etl_orders_spark.plans.media_queries  # noqa: F401
    import etl_orders_spark.plans.sketch_queries  # noqa: F401
    import etl_orders_spark.plans.stats_queries  # noqa: F401
    import etl_orders_spark.plans.text_queries  # noqa: F401
    import etl_orders_spark.plans.time_queries  # noqa: F401
    import etl_orders_spark.plans.tpch_queries  # noqa: F401
    import etl_orders_spark.plans.vector_queries  # noqa: F401


def query_map() -> dict[str, Builder]:
    _load_all()
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


def bench_queries() -> dict[str, Builder]:
    _load_all()
    return {name: spec.builder for name, spec in QUERIES.items() if spec.bench}

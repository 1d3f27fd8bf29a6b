"""Record linkage / entity resolution: blocked fuzzy matching.

The classic shape a warehouse user replaces a bespoke dedupe script
with: generate candidate pairs inside a BLOCK (equi-join on a coarse
key — never the O(n^2) cross join), score candidates with an edit
distance, keep pairs under a threshold. The block key is the entire
scale story: the join shuffles on it, so it must be selective enough
that the biggest block's pair count fits a task (at 100 TB: nation
alone is far too coarse — compose it with a name prefix / phonetic
key / length band; the operator shape is unchanged).

`levenshtein` is implemented natively by both Spark and DuckDB with
identical semantics, so the pair set is fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_orders_spark.plans.registry import register
from etl_orders_spark.sources.readers import load_table as T

_MAX_DIST = 1  # edit-distance threshold for a candidate match


@register(
    "fuzzy_match_customers",
    f"""
    WITH c AS (SELECT c_custkey, c_name, c_nationkey FROM customer)
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM c a JOIN c b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {_MAX_DIST}
    """,
    tags=("linkage", "dedup", "join"),
)
def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join over customers: candidates are generated
    by an equi-join on the block key (nation), ordered `id_a < id_b` so
    each pair appears once, then scored with native levenshtein. The
    equi conjunct keeps Catalyst on a hash/sort-merge join — the
    inequality and distance predicates are post-join filters, never a
    nested-loop driver."""
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
    )
    # threshold form early-abandons each DP row at dist > _MAX_DIST
    # (returns -1 instead), turning the per-pair cost from O(len²) into
    # O(len·k) — the dominant term when the block join emits millions of
    # candidate pairs
    dist = F.levenshtein("name_a", "name_b", _MAX_DIST).cast("long")
    return (
        a.join(b, "nk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _MAX_DIST))
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )

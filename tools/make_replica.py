"""RI-preserving N-fold replica of a testdata scale factor.

Reproduces the datasets behind SCALE.md's measured 10x/100x scale-up
probes: every key family (orderkey, custkey, partkey, suppkey,
event_id/user_id, doc_id, vec_id) is offset per replica so foreign
keys keep resolving inside their own replica — join/group cardinality
grows linearly, exactly like real growth, unlike naive row duplication
(which multiplies group sizes instead of group counts). Bounded dims
(nation, region) are NOT replicated: at any real scale they stay
25/5 rows. Document text gets a per-replica variation token appended
so corpus-wide dedup sees near-clones (realistically dup-heavy), not
byte-identical rows; embeddings are exact clones per replica, the
worst case for near-dup LSH bucket width.

Usage:
    python tools/make_replica.py SRC_SF_DIR OUT_DIR FACTOR
    # e.g. python tools/make_replica.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# key offsets: far above any real key in the family at sf<=1
OFFSETS = {
    "orderkey": 100_000_000,
    "custkey": 10_000_000,
    "partkey": 10_000_000,
    "suppkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

# table -> {column: key family}
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

BOUNDED = ("region", "nation")


def main() -> int:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from pyspark.sql import functions as F

    from etl_orders_spark.session import get_spark
    from etl_orders_spark.sources.readers import load_table

    spark = get_spark("make_replica")
    reps = spark.range(factor).select(F.col("id").alias("_rep"))

    for name in BOUNDED:
        load_table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"# {name}: copied (bounded dim)")

    for name, keys in KEYED.items():
        df = load_table(spark, src, name).crossJoin(F.broadcast(reps))
        for col, fam in keys.items():
            df = df.withColumn(col, F.col(col) + F.col("_rep") * OFFSETS[fam])
        if name == "documents":
            # near-clone text per replica: corpus-wide dedup must work
            # for its answers, not get byte-identical freebies
            df = df.withColumn(
                "text", F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("_rep")))
            )
        n_parts = max(spark.sparkContext.defaultParallelism, factor)
        (
            df.drop("_rep")
            .repartition(n_parts)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
        print(f"# {name}: x{factor}")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

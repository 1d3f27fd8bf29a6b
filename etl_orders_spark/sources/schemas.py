"""Explicit schemas for every table the engine reads.

At 100 TB, `inferSchema` means a full extra pass over the data and
nondeterministic typing; the reference relied on pandas inference +
positional header overwrite (reference: dags/etl.py:43,55). Here every
scan gets a declared schema so Catalyst can prune columns and push
filters into the parquet reader from the first plan.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver testdata star schema (TPC-H-ish; see /root/repo/TESTDATA.md) ---

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # physical type varies by testdata generation: INT64
            # TIMESTAMP(NANOS) (read via nanosAsLong as this LongType,
            # converted in load_table) or TIMESTAMP(MICROS) (load_table
            # swaps this field to TimestampType after a footer sniff)
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# --- reference-shaped fixtures (golden pipeline; see FIXTURES.md §A) ---
# Mirrors the reference generator's value domains
# (reference: dags/utils/create_data_source.ipynb cells 3/5/7/9).

ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Fecha", T.StringType()),  # yyyy-mm-dd; kept string at scan, typed by the pipeline
        T.StructField("Product_ID", T.LongType()),
        T.StructField("User_ID", T.LongType()),
    ]
)

PRODUCTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Category", T.StringType()),
        T.StructField("Price", T.LongType()),
    ]
)

USERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("Document", T.LongType()),
    ]
)

# user_info.json envelope: {"status": 200, "data": [ {...} ]}
# (reference: dags/etl.py:34-40 flattens envelope['data'])
USER_INFO_RECORD = T.StructType(
    [
        T.StructField("document", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("birthday", T.StringType()),  # ISO-8601 with T00:00:00 suffix
        T.StructField("gender", T.StringType()),  # dirty: M/F/Male/f/Other
        T.StructField("email", T.StringType()),
        T.StructField("phone", T.StringType()),
    ]
)

USER_INFO_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("status", T.IntegerType()),
        T.StructField("data", T.ArrayType(USER_INFO_RECORD)),
    ]
)

"""The reference's end-to-end pipeline, re-expressed as one lazy plan.

Reference dataflow (reference: dags/etl.py:292-298):
    users.csv ⋈ user_info.json (Document)          — dags/etl.py:84-86
    orders.csv ⋈ products.csv (Product_ID = Id)    — dags/etl.py:109-110
               ⋈ users (User_ID = Id)              — dags/etl.py:112-114
    → project 6 cols (dags/etl.py:117-118), rename Name_x→Product_Name
      (dags/etl.py:121-122), load as ORDERS with Fecha→ORDER_DATE
      (dags/utils/df_to_sql.py:2-4 positional mapping).

Where the reference materializes and type-erases the table between
every task via XCom (dags/etl.py:45), this module is a single Catalyst
plan: 16 Airflow tasks collapse into 3 composable functions, the
dimension joins are broadcast (the dims are tiny relative to facts —
at 100 TB the orders fact shuffles zero bytes for these joins), and
column pruning reaches the file scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_orders_spark.functions.cleaning import recode, truncate_iso_date

GENDER_RECODE = {"Male": "M", "f": "F"}  # reference: dags/etl.py:60


def transform_user_info(user_info: DataFrame) -> DataFrame:
    """Normalize the enrichment dimension (reference: dags/etl.py:48-66):
    title-case the schema, recode dirty gender variants, truncate the
    ISO birthday to a date string."""
    renamed = user_info.toDF("Document", "Name", "BirthDay", "Gender", "Email", "Phone")
    return renamed.withColumn("Gender", recode("Gender", GENDER_RECODE)).withColumn(
        "BirthDay", truncate_iso_date("BirthDay")
    )


def transform_users(users: DataFrame, user_info: DataFrame) -> DataFrame:
    """users ⋈ user_info on Document, inner (reference: dags/etl.py:84-86).
    Inner-join-as-referential-integrity-filter: info records without a
    user are dropped (500 → 300). Broadcast both ways is safe — both
    sides are dimensions."""
    return users.join(F.broadcast(transform_user_info(user_info)), on="Document", how="inner")


def transform_orders(orders: DataFrame, products: DataFrame, users: DataFrame) -> DataFrame:
    """The 3-way star denormalization (reference: dags/etl.py:89-124).

    orders ⋈ products drops dangling Product_IDs (reference domain: FKs
    1, 9, 10 have no product row — inner join sheds ~30% of facts);
    then ⋈ users on User_ID. Both dims broadcast: the fact side never
    shuffles. Collision suffixes (pandas' Name_x/Name_y, reference:
    dags/etl.py:121-122) are replaced by pre-aliasing at join time.
    """
    prod = F.broadcast(
        products.select(
            F.col("Id").alias("_p_id"),
            F.col("Name").alias("Product_Name"),
            "Category",
            "Price",
        )
    )
    usr = F.broadcast(users.select(F.col("Id").alias("_u_id")))
    joined = (
        orders.join(prod, orders["Product_ID"] == prod["_p_id"], "inner")
        .join(usr, orders["User_ID"] == usr["_u_id"], "inner")
    )
    return joined.select("Fecha", "User_ID", "Product_ID", "Product_Name", "Category", "Price")


def final_orders_for_load(final_orders: DataFrame) -> DataFrame:
    """S6 column-subset + positional rename onto the ORDERS target
    (reference: dags/utils/df_to_sql.py:2-4; ddl_orders_tbl.sql:3-11):
    Fecha → ORDER_DATE, rest upper-cased to the DDL's column names."""
    return final_orders.select(
        F.col("Fecha").alias("ORDER_DATE"),
        F.col("User_ID").alias("USER_ID"),
        F.col("Product_ID").alias("PRODUCT_ID"),
        F.col("Product_Name").alias("PRODUCT_NAME"),
        F.col("Category").alias("CATEGORY"),
        F.col("Price").alias("PRICE"),
    )

"""Golden end-to-end test of the reference pipeline (SURVEY.md §5.2).

Generates reference-shaped fixtures with the S7 generator (S7 →
outputFiles/* shapes), ingests them through the real scan operators
(S1 CSV, S2 JSON envelope), runs the pipeline plan, and asserts the
reference's observable semantics: RI-filter cardinalities (reference:
dags/etl.py:84-86, 109-114), gender recode, birthday truncation, and
the S6 positional load mapping.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_orders_spark.plans.reference_pipeline import (
    final_orders_for_load,
    transform_orders,
    transform_user_info,
    transform_users,
)
from etl_orders_spark.sources.generator import write_reference_fixtures
from etl_orders_spark.sources.readers import read_csv, read_json_envelope
from etl_orders_spark.sources.schemas import (
    ORDERS_CSV_SCHEMA,
    PRODUCTS_CSV_SCHEMA,
    USER_INFO_ENVELOPE_SCHEMA,
    USERS_CSV_SCHEMA,
)


@pytest.fixture(scope="module")
def fixtures(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("ref_fixtures")
    return write_reference_fixtures(spark, str(out))


@pytest.fixture(scope="module")
def tables(spark, fixtures):
    return {
        "orders": read_csv(spark, fixtures["orders"], ORDERS_CSV_SCHEMA),
        "products": read_csv(spark, fixtures["products"], PRODUCTS_CSV_SCHEMA),
        "users": read_csv(spark, fixtures["users"], USERS_CSV_SCHEMA),
        "user_info": read_json_envelope(spark, fixtures["user_info"], USER_INFO_ENVELOPE_SCHEMA),
    }


def test_fixture_shapes(tables):
    assert tables["orders"].count() == 3000
    assert tables["products"].count() == 7
    assert tables["users"].count() == 300
    assert tables["user_info"].count() == 500
    assert tables["user_info"].columns == ["document", "name", "birthday", "gender", "email", "phone"]


def test_transform_user_info_cleans_values(tables):
    info = transform_user_info(tables["user_info"])
    assert info.columns == ["Document", "Name", "BirthDay", "Gender", "Email", "Phone"]
    genders = {r["Gender"] for r in info.select("Gender").distinct().collect()}
    assert genders <= {"M", "F", "Other"}  # Male -> M, f -> F (reference: dags/etl.py:60)
    assert info.filter(F.col("BirthDay").contains("T")).count() == 0


def test_enriched_users_ri_filter(tables):
    # 500 info records ⋈ 300 users -> exactly 300 survive (reference: dags/etl.py:84-86)
    enriched = transform_users(tables["users"], tables["user_info"])
    assert enriched.count() == 300


def test_final_orders_ri_filter_and_shape(tables):
    final = transform_orders(tables["orders"], tables["products"], tables["users"])
    n = final.count()
    # dangling Product_IDs 1, 9, 10 drop (reference: dags/etl.py:109-110);
    # the exact survivor count is derivable independently of the join
    expected = tables["orders"].filter(F.col("Product_ID").between(2, 8)).count()
    assert n == expected
    assert 0.6 * 3000 <= n <= 0.8 * 3000  # ~70% survival
    assert final.columns == ["Fecha", "User_ID", "Product_ID", "Product_Name", "Category", "Price"]


def test_load_projection_positional_rename(tables):
    final = transform_orders(tables["orders"], tables["products"], tables["users"])
    load = final_orders_for_load(final)
    # S6 positional mapping: Fecha -> ORDER_DATE (reference: dags/utils/df_to_sql.py:2-4)
    assert load.columns == ["ORDER_DATE", "USER_ID", "PRODUCT_ID", "PRODUCT_NAME", "CATEGORY", "PRICE"]
    assert load.count() == final.count()


def test_pipeline_is_one_lazy_plan_with_broadcasts(tables):
    final = transform_orders(tables["orders"], tables["products"], tables["users"])
    plan = final._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dims broadcast; fact side never shuffles

"""The runnable pipeline entry point: one invocation must generate
fixtures, run the star denormalization, and load both tables — the
process a scheduler (the reference's daily Airflow trigger) invokes."""

from __future__ import annotations

from etl_orders_spark.run_pipeline import run
from etl_orders_spark.sources.generator import write_reference_fixtures


def test_run_pipeline_end_to_end(spark, tmp_path):
    data_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    write_reference_fixtures(spark, data_dir)
    counts = run(spark, data_dir, out_dir)

    assert counts["USERS"] == 300  # 500 info ⋈ 300 users (reference: dags/etl.py:84-86)
    assert 0.6 * 3000 <= counts["ORDERS"] <= 0.8 * 3000  # dangling-FK drop (~70% survive)

    orders = spark.read.parquet(f"{out_dir}/ORDERS")
    assert orders.columns == [
        "ORDER_DATE", "USER_ID", "PRODUCT_ID", "PRODUCT_NAME", "CATEGORY", "PRICE"
    ]
    assert orders.count() == counts["ORDERS"]
    assert spark.read.parquet(f"{out_dir}/USERS").count() == 300

from etl_orders_spark.plans.registry import QUERIES, QuerySpec, oracle_map, query_map  # noqa: F401

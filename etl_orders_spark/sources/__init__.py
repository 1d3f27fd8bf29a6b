from etl_orders_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    read_csv,
    read_json_envelope,
    read_parquet,
)
from etl_orders_spark.sources.writers import write_overwrite_table, write_parquet  # noqa: F401

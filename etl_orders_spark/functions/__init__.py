from etl_orders_spark.functions.cleaning import recode, truncate_iso_date  # noqa: F401
from etl_orders_spark.functions.text import (  # noqa: F401
    fingerprint,
    normalize_text,
    quality_features,
    token_count,
    tokens,
)
from etl_orders_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401

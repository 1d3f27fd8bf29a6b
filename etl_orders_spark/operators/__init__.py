from etl_orders_spark.operators.asof import asof_join, range_join  # noqa: F401
from etl_orders_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from etl_orders_spark.operators.sessionize import sessionize  # noqa: F401
from etl_orders_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk  # noqa: F401
from etl_orders_spark.operators.topk import topk_per_group  # noqa: F401

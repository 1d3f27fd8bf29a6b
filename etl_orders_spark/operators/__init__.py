from etl_orders_spark.operators.asof import asof_join, range_join  # noqa: F401
from etl_orders_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    verify_jaccard,
    winnow_fingerprints,
)
from etl_orders_spark.operators.grouped_map import (  # noqa: F401
    zscore_by_group,
    zscore_by_group_native,
)
from etl_orders_spark.operators.profile import profile_columns  # noqa: F401
from etl_orders_spark.operators.sessionize import session_stats, sessionize  # noqa: F401
from etl_orders_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
    near_dup_pairs_bucketed,
)
from etl_orders_spark.operators.skew import salted_join  # noqa: F401
from etl_orders_spark.operators.topk import topk_per_group  # noqa: F401

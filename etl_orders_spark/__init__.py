"""etl_orders_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference ETL pipeline (manliot/ETL-orders: multi-format ingestion,
schema normalization, value recoding, star-schema denormalization,
batch load), re-expressed Spark-first (DataFrame/SQL/Catalyst/Structured
Streaming) and extended with the operators a large-scale training-data
pipeline needs: dedup (exact/MinHash/SimHash/Jaccard), similarity
search over embeddings, text analysis, time-window analytics, and
streaming.

Design posture (100 TB):
- Declarative logical plans only — Catalyst does pushdown/pruning/join
  selection; no driver-side collect loops in any operator path.
- Explicit schemas on every scan (no inferSchema).
- Broadcast hints for dimension joins; AQE enabled for skew/coalesce.
- JVM-side expressions everywhere; Arrow-batched pandas only where
  built-ins genuinely can't express the semantics (multimodal decode).
"""

__version__ = "0.1.0"

from etl_orders_spark.session import get_spark  # noqa: F401

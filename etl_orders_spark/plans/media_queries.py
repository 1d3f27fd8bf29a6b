"""Multimodal queries registered with the driver.

`media_fingerprints_docs` builds a media-shaped relation from the
documents table (content = utf-8 bytes of text) so the binary
fingerprint path is oracle-checkable; the synthetic-media queries are
rows-only (mapInPandas feature extraction has no SQL twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_orders_spark.multimodal.ops import media_fingerprints, media_stats, sample_frames
from etl_orders_spark.multimodal.schemas import gen_media
from etl_orders_spark.plans.registry import register
from etl_orders_spark.sources.readers import load_table as T


@register(
    "media_fingerprints_docs",
    """
    SELECT doc_id AS media_id, 'text' AS kind, md5(text) AS fp,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    tags=("media", "dedup"),
)
def media_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-content fingerprinting (exact media dedup key), proven on
    the documents table by treating utf-8 text bytes as the payload —
    md5-over-bytes is engine-portable, so the oracle checks it."""
    docs = T(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
    )
    return media_fingerprints(media).withColumn("n_bytes", F.col("n_bytes").cast("long"))


@register(
    "media_stats_synthetic",
    None,  # Arrow-batched pandas feature extraction: no SQL twin
    tags=("media", "pandas-udf"),
)
def media_stats_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level media features over the synthetic media table via
    mapInPandas — the registered proof that the Arrow batch path runs
    under the driver's session."""
    return media_stats(gen_media(spark, 300))


@register(
    "media_frame_sample",
    None,  # fan-out with fake frame payloads: rows-only
    tags=("media", "pandas-udf"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling fan-out (1 row per sampled frame)."""
    frames = sample_frames(gen_media(spark, 300), every_ms=1000, max_frames=8)
    return frames.select("media_id", "frame_idx", "frame_ms", F.length("frame_bytes").alias("n"))

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB of media:
- content is an opaque `binary` column; all engine-side operations
  (filter, partition, join, dedup-by-fingerprint) use the typed
  metadata struct and never deserialize pixels JVM-side;
- decode / feature-extract / resize / frame-sample run as
  Arrow-batched pandas functions over `mapInPandas` — one Python
  worker per partition, whole column batches across the Arrow
  boundary, never per-row pickling;
- actual codecs (PIL/libav) are NOT available in this container: the
  pixel-decode step is stubbed behind ImportError-gated
  NotImplementedError, while byte-level features (size, entropy-ish
  stats, content fingerprint) are real and deterministic, so the
  plumbing — schema, batch shape, partitioning — is fully testable.
"""

from etl_orders_spark.multimodal.ops import (
    decode_images,
    media_fingerprints,
    media_stats,
    resize_images,
    sample_frames,
)
from etl_orders_spark.multimodal.schemas import MEDIA_SCHEMA, gen_media

__all__ = [
    "MEDIA_SCHEMA",
    "decode_images",
    "gen_media",
    "media_fingerprints",
    "resize_images",
    "media_stats",
    "sample_frames",
]

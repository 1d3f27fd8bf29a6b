"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB of media:
- content is an opaque `binary` column; all engine-side operations
  (filter, partition, join, dedup-by-fingerprint) use the typed
  metadata struct and never deserialize pixels JVM-side;
- decode / feature-extract / resize / frame-sample run as
  Arrow-batched pandas functions over `mapInPandas` — one Python
  worker per partition, whole column batches across the Arrow
  boundary, never per-row pickling;
- pixel decode is REAL for uncompressed containers (PPM/PGM/BMP)
  AND for PNG (stdlib-zlib DEFLATE + the five scanline unfilters,
  chunk CRCs verified — pure-Python codecs in multimodal/codecs.py);
  the strict decode -> resize -> feature path executes here and
  carries DuckDB value-hash oracles on generated fixtures. GIF decodes
  natively too (from-scratch variable-width LZW + 4-pass interlace
  unweave), and baseline JPEG decodes natively as well (stream-read
  Huffman + matrix IDCT, jpeg.py) — covering both lossless web
  formats AND the dominant lossy one. Shapes the native codecs gate
  (arithmetic/12-bit JPEG, lossy-VP8 WebP) fall through to PIL when
  present and otherwise raise the honest NotImplementedError,
  while byte-level features (size, entropy-ish stats, content
  fingerprint) stay codec-free and deterministic.
"""

from etl_orders_spark.multimodal.codecs import (
    decode_gif,
    decode_image,
    decode_png,
    resize_nearest,
    sniff_format,
)
from etl_orders_spark.multimodal.codecs import decode_wav, decode_y4m
from etl_orders_spark.multimodal.ops import (
    audio_features,
    decode_images,
    dhash_images,
    media_fingerprints,
    media_stats,
    pixel_features,
    resize_images,
    sample_frames,
    video_frame_stats,
)
from etl_orders_spark.multimodal.schemas import (
    MEDIA_SCHEMA,
    gen_gif_media,
    gen_media,
    gen_noise_media,
    gen_noise_y4m_media,
    gen_pixel_media,
    gen_png_media,
    gen_mulaw_wav_media,
    gen_tone_wav_media,
    gen_wav_media,
    gen_y4m_media,
)

__all__ = [
    "MEDIA_SCHEMA",
    "audio_features",
    "decode_gif",
    "decode_image",
    "decode_images",
    "decode_png",
    "decode_wav",
    "decode_y4m",
    "dhash_images",
    "gen_gif_media",
    "gen_media",
    "gen_noise_media",
    "gen_noise_y4m_media",
    "gen_pixel_media",
    "gen_png_media",
    "gen_mulaw_wav_media",
    "gen_tone_wav_media",
    "gen_wav_media",
    "gen_y4m_media",
    "video_frame_stats",
    "media_fingerprints",
    "media_stats",
    "pixel_features",
    "resize_images",
    "resize_nearest",
    "sample_frames",
    "sniff_format",
]

"""Multimodal queries registered with the driver.

`media_fingerprints_docs` builds a media-shaped relation from the
documents table (content = utf-8 bytes of text) so the binary
fingerprint path is oracle-checkable; the byte-level synthetic-media
queries are rows-only (mapInPandas feature extraction has no SQL
twin).

The PIXEL queries carry FULL value-hash oracles: the fixture generator
(schemas.gen_pixel_media) encodes real PPM/PGM/BMP images whose every
pixel is a closed-form function of (media_id, x, y), the pure-Python
codecs (multimodal/codecs.py) decode them, and the DuckDB twin
re-derives the same pixels arithmetically with generate_series — so a
hash match certifies encode -> decode -> resize -> feature end to end
(header parsing, BGR order, row padding, bottom-up flip, the floor-
mapped nearest-neighbor resample, and the integer feature math).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_orders_spark.multimodal.ops import (
    media_fingerprints,
    media_stats,
    pixel_features,
    resize_images,
    sample_frames,
)
from etl_orders_spark.multimodal.schemas import gen_media, gen_pixel_media
from etl_orders_spark.plans.registry import register
from etl_orders_spark.sources.readers import load_table as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_N_PIXEL_MEDIA = 120  # fixture count shared by the Spark and SQL sides

# One CTE chain derives the generator's pixel law (schemas.gen_pixel_media)
# arithmetically: ids -> per-id dims/format -> per-pixel channel values.
_PIXEL_LAW_CTES = f"""
    ids AS (SELECT UNNEST(generate_series(0, {_N_PIXEL_MEDIA - 1})) AS media_id),
    dims AS (
      SELECT media_id,
             CASE CAST(media_id % 3 AS INTEGER)
               WHEN 0 THEN 'ppm' WHEN 1 THEN 'pgm' ELSE 'bmp' END AS fmt,
             16 + media_id % 16 AS w,
             12 + media_id % 8 AS h
      FROM ids
    )
"""


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
    "media_decode_pixel_stats",
    f"""
    WITH {_PIXEL_LAW_CTES},
    px AS (
      SELECT d.media_id, d.fmt, d.w, d.h,
             (7 * d.media_id + 3 * x.i + 5 * y.i) % 256 AS v
      FROM dims d,
           UNNEST(generate_series(0, d.w - 1)) AS x(i),
           UNNEST(generate_series(0, d.h - 1)) AS y(i)
    ),
    agg AS (
      SELECT media_id, ANY_VALUE(fmt) AS fmt, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
             COUNT(*) AS n,
             SUM(v) AS sr,
             SUM(CASE WHEN fmt = 'pgm' THEN v ELSE (v + 85) % 256 END) AS sg,
             SUM(CASE WHEN fmt = 'pgm' THEN v ELSE (v + 170) % 256 END) AS sb
      FROM px GROUP BY media_id
    )
    SELECT media_id, fmt,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(n AS BIGINT) AS n_pixels,
           CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g,
           CAST(sb AS BIGINT) AS sum_b,
           CAST((sr + sg + sb) * 1000 // (3 * n) AS BIGINT) AS mean_rgb_milli
    FROM agg
    """,
    tags=("media", "pixel", "pandas-udf"),
)
def media_decode_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode, oracle-checked: generate PPM/PGM/BMP images
    whose pixels follow a closed-form law, decode them with the
    pure-Python codecs inside an Arrow-batched mapInPandas, and emit
    exact integer channel features. The DuckDB twin re-derives the
    same pixels arithmetically — a hash match certifies the decoders
    (netpbm header parsing, BMP BGR order / row padding / bottom-up
    flip) and the feature math bit-for-bit. Format sniffing is part of
    the certified surface (the fmt column comes from magic bytes on
    the Spark side, from the generator law on the oracle side)."""
    return pixel_features(gen_pixel_media(spark, _N_PIXEL_MEDIA))


_THUMB_SIDE = 8


@register(
    "media_thumbnail_pixel_sums",
    f"""
    WITH {_PIXEL_LAW_CTES},
    geom AS (
      SELECT media_id, fmt, w, h,
             CASE WHEN GREATEST(w, h) <= {_THUMB_SIDE} THEN w
                  WHEN w >= h THEN {_THUMB_SIDE}
                  ELSE GREATEST(1, (w * {_THUMB_SIDE}) // h) END AS ow,
             CASE WHEN GREATEST(w, h) <= {_THUMB_SIDE} THEN h
                  WHEN w >= h THEN GREATEST(1, (h * {_THUMB_SIDE}) // w)
                  ELSE {_THUMB_SIDE} END AS oh
      FROM dims
    ),
    px AS (
      SELECT g.media_id, g.fmt, g.ow, g.oh,
             (7 * g.media_id + 3 * ((dx.i * g.w) // g.ow)
                             + 5 * ((dy.i * g.h) // g.oh)) % 256 AS v
      FROM geom g,
           UNNEST(generate_series(0, g.ow - 1)) AS dx(i),
           UNNEST(generate_series(0, g.oh - 1)) AS dy(i)
    )
    SELECT media_id,
           CAST(ANY_VALUE(ow) AS INTEGER) AS out_w,
           CAST(ANY_VALUE(oh) AS INTEGER) AS out_h,
           CAST(SUM(v) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN fmt = 'pgm' THEN v ELSE (v + 85) % 256 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN fmt = 'pgm' THEN v ELSE (v + 170) % 256 END) AS BIGINT) AS sum_b
    FROM px
    GROUP BY media_id
    """,
    tags=("media", "pixel", "pandas-udf"),
)
def media_thumbnail_pixel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strict thumbnail pipeline, oracle-checked end to end:
    decode -> floor-mapped nearest-neighbor resize (the longer side
    capped at {side}px, exact integer aspect arithmetic) -> per-channel
    integer sums over the RESIZED pixels. The DuckDB twin applies the
    identical floor mapping src = (dst * src_dim) // out_dim to the
    generator's pixel law, so a hash match certifies the resample's
    exact geometry AND sample selection — not just row counts."""

    thumbs = resize_images(
        gen_pixel_media(spark, _N_PIXEL_MEDIA), max_side=_THUMB_SIDE, strict=True
    )

    def sums(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, ow, oh, thumb in zip(
                pdf["media_id"], pdf["out_w"], pdf["out_h"], pdf["thumb"]
            ):
                arr = np.frombuffer(bytes(thumb), dtype=np.uint8).reshape(-1, 3)
                s = arr.astype("int64").sum(axis=0)
                rows.append((mid, int(ow), int(oh), int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                rows, columns=["media_id", "out_w", "out_h", "sum_r", "sum_g", "sum_b"]
            )

    return thumbs.select("media_id", "out_w", "out_h", "thumb").mapInPandas(
        sums,
        "media_id long, out_w int, out_h int, sum_r long, sum_g long, sum_b long",
    )


@register(
    "media_frame_sample",
    None,  # fan-out with fake frame payloads: rows-only
    tags=("media", "pandas-udf"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling fan-out (1 row per sampled frame)."""
    frames = sample_frames(gen_media(spark, 300), every_ms=1000, max_frames=8)
    return frames.select("media_id", "frame_idx", "frame_ms", F.length("frame_bytes").alias("n"))

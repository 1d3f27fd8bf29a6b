"""Media table schema + deterministic synthetic generator.

The meta struct is the queryable surface: partition/filter/join on
kind + format + dimensions without ever touching content bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

_KINDS = ("image", "audio", "video")
_FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}


def gen_media(spark: SparkSession, n: int = 100, payload_bytes: int = 256) -> DataFrame:
    """Deterministic synthetic media rows: content = repeated sha2 of
    the id (opaque but reproducible bytes), metadata consistent with
    the kind. Pure Spark plan — scales like any range source."""
    # one shared cycling index: kind and format MUST stay consistent
    # per row, so format indexes with the same expression, never a copy
    kind_idx = (F.col("id") % 3 + 1).cast("int")
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), kind_idx)
    payload_hex = F.concat(
        *[F.sha2(F.concat(F.col("id").cast("string"), F.lit(f"|{i}")), 256) for i in range((payload_bytes + 31) // 32)]
    )
    meta = F.struct(
        F.element_at(
            F.array(*[F.lit(_FORMATS[k]) for k in _KINDS]), kind_idx
        ).alias("format"),
        F.when(kind == "audio", F.lit(None).cast("int"))
        .otherwise((F.col("id") % 4 * 160 + 320).cast("int"))
        .alias("width"),
        F.when(kind == "audio", F.lit(None).cast("int"))
        .otherwise((F.col("id") % 4 * 90 + 240).cast("int"))
        .alias("height"),
        F.when(kind == "audio", F.lit(16000).cast("int")).otherwise(F.lit(None).cast("int")).alias(
            "sample_rate"
        ),
        F.when(kind == "image", F.lit(None).cast("long"))
        .otherwise((F.col("id") % 30 * 1000 + 1000).cast("long"))
        .alias("duration_ms"),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.unhex(F.substring(payload_hex, 1, payload_bytes * 2)).alias("content"),
        meta.alias("meta"),
    )

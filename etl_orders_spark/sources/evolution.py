"""Schema evolution: scan parquet written across schema generations
and conform any frame to a governed target schema.

Real lake tables grow columns over their lifetime, so at 100 TB a
fact directory is never schema-homogeneous: files written before a
column existed simply lack it. The two primitives here are the
standard data-lake answer (the capability Delta/Iceberg bake into
their readers, expressed over plain parquet):

- ``read_parquet_evolved`` — one scan over heterogeneous files via
  parquet schema merging (footer union at planning time, NOT a data
  pass); rows from pre-column files carry typed NULLs.
- ``conform_to_schema`` — align any frame to a target StructType:
  missing columns materialize as typed NULLs, safely-widenable types
  upcast (int→long, float→double, date→timestamp), extra columns
  drop, and anything lossy fails loudly (a silent long→int narrowing
  is data corruption, not evolution).

Scale posture: both are pure plan transformations — the NULL fill and
casts are projection expressions inside whole-stage codegen, and the
schema union reads footers, never data. The merge cost grows with the
FILE count, so production tables still compact old generations; the
read path just stops requiring that compaction to be synchronous with
the schema change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widening conversions that are value-preserving for every input;
# anything outside this table (or an exact type match) is lossy
_SAFE_UPCASTS: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType),
    T.ShortType: (T.IntegerType, T.LongType),
    T.IntegerType: (T.LongType,),
    T.FloatType: (T.DoubleType,),
    T.DateType: (T.TimestampType,),
}


def _safe_upcast(src: T.DataType, dst: T.DataType) -> bool:
    return any(
        isinstance(src, s) and isinstance(dst, d)
        for s, dsts in _SAFE_UPCASTS.items()
        for d in dsts
    )


def conform_to_schema(
    df: DataFrame, target: T.StructType, on_extra: str = "drop"
) -> DataFrame:
    """Project ``df`` onto ``target``: target column order, missing
    columns as typed NULLs, safe upcasts applied, lossy mismatches
    rejected with a ValueError naming the column.

    ``on_extra``: "drop" (default) discards columns not in the target;
    "error" rejects them — the strict mode for governed sinks where an
    unexpected upstream column means a contract break, not evolution.
    """
    have = {f.name.lower(): f for f in df.schema.fields}
    extra = [c for c in df.columns if c.lower() not in {f.name.lower() for f in target.fields}]
    if extra and on_extra == "error":
        raise ValueError(f"conform_to_schema: unexpected columns {extra} not in target schema")
    cols = []
    for field in target.fields:
        src = have.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif src.dataType == field.dataType:
            cols.append(F.col(src.name).alias(field.name))
        elif _safe_upcast(src.dataType, field.dataType):
            cols.append(F.col(src.name).cast(field.dataType).alias(field.name))
        else:
            raise ValueError(
                f"conform_to_schema: column {field.name!r} is "
                f"{src.dataType.simpleString()} but target wants "
                f"{field.dataType.simpleString()} — not a safe widening; "
                "evolve the target or transform explicitly"
            )
    return df.select(*cols)


def read_parquet_evolved(
    spark: SparkSession,
    paths: list[str] | str,
    target: T.StructType | None = None,
) -> DataFrame:
    """Scan parquet files spanning schema generations. Without a
    ``target``, the reader unions the file footers' schemas
    (mergeSchema) — which covers column ADDS (typed NULLs for files
    that predate the column) but refuses type changes: parquet footer
    merging cannot widen int32 to int64. With ``target``, each path is
    conformed independently (typed-NULL fill, safe upcasts, strict on
    lossy drift) and the conformed frames union — so a generation that
    widened a column merges fine, and every scan still prunes and
    pushes down on its own files."""
    if isinstance(paths, str):
        paths = [paths]
    if target is None:
        return spark.read.option("mergeSchema", "true").parquet(*paths)
    frames = [conform_to_schema(spark.read.parquet(p), target) for p in paths]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def schema_diff(old: T.StructType, new: T.StructType) -> dict[str, list[str]]:
    """Classify the change between two schema generations — the
    governance report a lake table needs BEFORE accepting a writer's
    new schema (conform_to_schema then enforces the verdict at read
    time):

    - ``added``: columns only in ``new`` (old files will read as typed
      NULLs — always safe).
    - ``removed``: columns only in ``old`` (readers of ``new`` lose
      them — safe only if downstream consumers agree).
    - ``widened``: same column, value-preserving type upcast
      (int→long, float→double, date→timestamp — safe).
    - ``incompatible``: same column, any other type change (a
      narrowing or a cross-family rewrite — data corruption if waved
      through; reject the write or require an explicit transform).

    Case-insensitive on names, like conform_to_schema. Pure metadata —
    no data access."""
    o = {f.name.lower(): f for f in old.fields}
    n = {f.name.lower(): f for f in new.fields}
    out: dict[str, list[str]] = {"added": [], "removed": [], "widened": [], "incompatible": []}
    for key, nf in n.items():
        of = o.get(key)
        if of is None:
            out["added"].append(nf.name)
        elif of.dataType == nf.dataType:
            continue
        elif _safe_upcast(of.dataType, nf.dataType):
            out["widened"].append(
                f"{nf.name}: {of.dataType.simpleString()} -> {nf.dataType.simpleString()}"
            )
        else:
            out["incompatible"].append(
                f"{nf.name}: {of.dataType.simpleString()} -> {nf.dataType.simpleString()}"
            )
    out["removed"] = [o[k].name for k in o if k not in n]
    return out

"""Resilient parquet scan: survive corrupt files, and say WHICH ones.

At 100 TB a fact directory always contains a few bad files — truncated
by a killed writer, bit-rotted, or half-replicated. Spark's
`spark.sql.files.ignoreCorruptFiles` makes the scan survive them, but
silently: the row count quietly drops and nobody learns which files
died. The pair here restores the CSV quarantine lane's contract
(sources/readers.py) for parquet:

- ``validate_parquet_files`` — a DISTRIBUTED footer audit: the file
  listing parallelizes across executors and each worker parses footers
  with pyarrow (a footer read, never a data scan), emitting
  (path, ok, error) per file.
- ``read_parquet_resilient`` — scans exactly the files the audit
  proved good (an explicit allowlist — stronger than
  ignoreCorruptFiles, which both skips silently and still dies on a
  file whose footer parses but whose pages are torn) and returns the
  quarantine report beside the DataFrame, so the loss is measured and
  attributable instead of silent.

Scale: the audit costs one footer parse per file, distributed — at
100k files that is a few seconds across a fleet, and it is the same
metadata the scan planner touches anyway. The report is file-grain
(bounded by file count, not rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _list_parquet_files(root: str) -> list[str]:
    """Leaf .parquet data files under root (a file, a flat directory,
    or a hive-partitioned tree). Skips _SUCCESS/_metadata markers and
    hidden files AND prunes hidden/underscore directories
    (_temporary, _spark_metadata, .staging trees a killed writer
    leaves behind), mirroring Spark's own listing rules — descending
    into _temporary would resurrect uncommitted task attempts as
    'good' duplicate rows."""
    if os.path.isfile(root):
        return [root]
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for f in filenames:
            if f.startswith(("_", ".")):
                continue
            out.append(os.path.join(dirpath, f))
    return sorted(out)


def validate_parquet_files(spark: SparkSession, root: str) -> DataFrame:
    """Distributed footer audit → (path, ok, error) per data file."""
    files = _list_parquet_files(root)
    if not files:
        return spark.createDataFrame([], "path string, ok boolean, error string")
    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        min(len(files), 64)
    )

    def check(batches):  # closure: pickled by value
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                try:
                    md = pq.ParquetFile(p).metadata  # footer parse only
                    rows.append((p, True, None)) if md is not None else rows.append(
                        (p, False, "no metadata")
                    )
                except Exception as e:  # noqa: BLE001 — the point is to report
                    rows.append((p, False, f"{type(e).__name__}: {e}"[:200]))
            yield pd.DataFrame(rows, columns=["path", "ok", "error"])

    return fdf.mapInPandas(check, "path string, ok boolean, error string")


def read_parquet_resilient(
    spark: SparkSession, root: str
) -> tuple[DataFrame, DataFrame]:
    """Scan `root` surviving corrupt members; return (data, report).

    The data scan reads only the files the audit proved good — an
    explicit allowlist, so the result is deterministic and the loss is
    exactly the report's `ok = false` rows (`ignoreCorruptFiles` alone
    can still die on a file whose footer parses but whose pages are
    torn, and says nothing about what it skipped). Raises if NO file
    is readable — an all-corrupt directory is an outage, not a lane.

    The audit executes ONCE: its (file-grain, bounded) rows collect to
    the driver and the returned report is rebuilt from them, so a
    caller inspecting the report doesn't re-parse every footer.
    """
    rows = validate_parquet_files(spark, root).collect()
    good = [r["path"] for r in rows if r["ok"]]
    if not good:
        raise ValueError(f"read_parquet_resilient: no readable parquet under {root}")
    report = spark.createDataFrame(rows, "path string, ok boolean, error string")
    return spark.read.parquet(*good), report

"""Resilient parquet scan: corrupt members are skipped AND named
(sources/resilient.py) — the read-side quarantine lane."""

from __future__ import annotations

import os

import pytest

from etl_orders_spark.sources.resilient import (
    read_parquet_resilient,
    validate_parquet_files,
)


@pytest.fixture()
def dir_with_corruption(spark, tmp_path):
    """Two good parquet files + one truncated one + one pure-garbage
    one, like a directory a killed writer left behind."""
    root = str(tmp_path / "facts")
    spark.createDataFrame([(i, i * 10.0) for i in range(100)], "id long, v double").coalesce(
        2
    ).write.parquet(root)
    parts = [f for f in os.listdir(root) if f.endswith(".parquet")]
    assert len(parts) == 2
    # truncate a COPY so both good parts survive
    src = os.path.join(root, parts[0])
    with open(src, "rb") as f:
        blob = f.read()
    with open(os.path.join(root, "part-torn.snappy.parquet"), "wb") as f:
        f.write(blob[: len(blob) // 2])  # no footer magic at the tail
    with open(os.path.join(root, "part-junk.snappy.parquet"), "wb") as f:
        f.write(b"this was never parquet")
    return root


def test_validate_names_exactly_the_bad_files(spark, dir_with_corruption):
    rep = {r["path"]: (r["ok"], r["error"]) for r in validate_parquet_files(spark, dir_with_corruption).collect()}
    assert len(rep) == 4
    bad = {os.path.basename(p) for p, (ok, _) in rep.items() if not ok}
    assert bad == {"part-torn.snappy.parquet", "part-junk.snappy.parquet"}
    assert all(err for p, (ok, err) in rep.items() if not ok)  # errors carried


def test_resilient_read_returns_all_good_rows(spark, dir_with_corruption):
    df, rep = read_parquet_resilient(spark, dir_with_corruption)
    assert df.count() == 100  # every row from the two good files
    assert rep.filter("NOT ok").count() == 2
    # control: the plain scan dies on the same directory
    with pytest.raises(Exception):
        spark.read.parquet(dir_with_corruption).count()


def test_all_corrupt_raises_instead_of_returning_empty(spark, tmp_path):
    root = tmp_path / "dead"
    root.mkdir()
    (root / "a.parquet").write_bytes(b"junk")
    with pytest.raises(ValueError, match="no readable parquet"):
        read_parquet_resilient(spark, str(root))


def test_listing_prunes_writer_metadata_directories(spark, tmp_path):
    """A killed writer's _temporary tree holds uncommitted task
    attempts with VALID footers — descending into it would resurrect
    them as duplicate rows. The audit must prune _ and . directories,
    exactly like Spark's own listing."""
    import shutil

    root = str(tmp_path / "facts")
    spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1).write.parquet(root)
    part = next(f for f in os.listdir(root) if f.endswith(".parquet"))
    tmpdir = os.path.join(root, "_temporary", "0")
    os.makedirs(tmpdir)
    shutil.copy(os.path.join(root, part), os.path.join(tmpdir, "attempt-part.parquet"))
    rep = validate_parquet_files(spark, root).collect()
    assert [os.path.basename(r["path"]) for r in rep] == [part]
    df, _ = read_parquet_resilient(spark, root)
    assert df.count() == 1  # the uncommitted attempt did not double the row

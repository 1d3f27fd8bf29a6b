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


def test_manifest_mode_matches_native_mode(spark, dir_with_corruption):
    """Forcing the distributed manifest scan (threshold=0) returns the
    exact rows the native-path mode returns on the same corrupt
    directory — the two modes are interchangeable lanes."""
    native, rep_a = read_parquet_resilient(spark, dir_with_corruption)
    manifest, rep_b = read_parquet_resilient(
        spark, dir_with_corruption, manifest_threshold=0
    )
    assert sorted(manifest.columns) == sorted(native.columns)
    assert sorted(map(tuple, manifest.select(*native.columns).collect())) == sorted(
        map(tuple, native.collect())
    )
    assert rep_a.filter("NOT ok").count() == rep_b.filter("NOT ok").count() == 2
    # the manifest plan carries NO per-file path relations — the file
    # list reaches workers as DataFrame rows through a mapInPandas
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    assert "mapinpandas" in plan.lower()


def test_partitioned_tree_keeps_partition_columns(spark, tmp_path):
    """ADVICE r3: leaf-file scans of a hive tree silently dropped the
    partition columns without basePath. Both modes must surface them."""
    root = str(tmp_path / "tree")
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, k long, v double"
    ).write.partitionBy("k").parquet(root)
    # wound one leaf so the resilient path actually engages
    leaf_dir = os.path.join(root, "k=1")
    bad = os.path.join(leaf_dir, "part-bad.snappy.parquet")
    with open(bad, "wb") as f:
        f.write(b"torn")

    native, rep = read_parquet_resilient(spark, root)
    assert set(native.columns) == {"id", "v", "k"}  # partition col SURVIVES
    assert native.filter("k = 2").count() == 10
    assert rep.filter("NOT ok").count() == 1

    manifest, _ = read_parquet_resilient(spark, root, manifest_threshold=0)
    assert set(manifest.columns) == {"id", "v", "k"}
    # manifest mode types partition values as strings (documented);
    # compare engine-agnostically through casts
    a = sorted((r["id"], int(r["k"]), r["v"]) for r in manifest.collect())
    b = sorted((r["id"], int(r["k"]), r["v"]) for r in native.collect())
    assert a == b


def test_manifest_mode_bounded_at_large_file_counts(spark, tmp_path):
    """>=10k-part directory: the audit and the manifest scan must both
    complete without any driver-side path materialization beyond the
    bounded report blocks (the r3 advisory's 10^5-file concern, scaled
    to CI time). Files are written driver-side with pyarrow --
    minimal 1-row parts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "many"
    root.mkdir()
    n = 10_000
    for i in range(n):
        pq.write_table(
            pa.table({"id": pa.array([i], pa.int64())}),
            root / f"part-{i:05d}.parquet",
        )
    (root / "part-junk.parquet").write_bytes(b"junk")

    (root / "part-torn.parquet").write_bytes(b"PAR1" + b"\x00" * 64)

    df, rep = read_parquet_resilient(spark, str(root), manifest_threshold=100)
    assert df.count() == n
    assert df.agg({"id": "sum"}).collect()[0][0] == n * (n - 1) // 2
    assert rep.count() == n + 2
    assert rep.filter("NOT ok").count() == 2

    # the dead-letter relation: per-error-class file counts and bytes,
    # computed distributed through the same report — the daily operator
    # surface at 10^5-file scale (VERDICT r4 task 6)
    from etl_orders_spark.sources.resilient import dead_letter_metrics

    dl = dead_letter_metrics(rep).collect()
    assert sum(r["n_files"] for r in dl) == 2
    bad_bytes = {
        os.path.basename(r["path"]): r["bytes"] for r in rep.filter("NOT ok").collect()
    }
    assert bad_bytes["part-junk.parquet"] == len(b"junk")
    assert bad_bytes["part-torn.parquet"] == 68
    assert sum(r["total_bytes"] for r in dl) == len(b"junk") + 68
    assert all(r["error_class"] for r in dl)  # bounded grouping key present


def test_manifest_mode_preserves_timestamp_ntz(spark, sf_dir, tmp_path):
    """TIMESTAMP_NTZ columns must type identically in both scan modes
    (prefer_timestamp_ntz on the arrow schema): without it the
    manifest mode would session-tz-adjust what the native reader
    leaves naive."""
    import shutil

    root = tmp_path / "orders_copy"
    root.mkdir()
    shutil.copy(os.path.join(sf_dir, "orders.parquet"), root / "part-0.parquet")
    native, _ = read_parquet_resilient(spark, str(root))
    manifest, _ = read_parquet_resilient(spark, str(root), manifest_threshold=0)
    assert native.schema.simpleString() == manifest.schema.simpleString()
    rn = sorted(map(tuple, native.collect()))
    rm = sorted(map(tuple, manifest.select(*native.columns).collect()))
    assert rn == rm


def test_manifest_mode_survives_schema_evolution(spark, tmp_path):
    """A schema-evolved directory (older generation missing columns)
    must behave identically in both scan modes: missing columns fill
    with NULL, never a worker KeyError — and the manifest schema is
    deterministic (lexicographically-first good footer, not limit(1))."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "evolved"
    root.mkdir()
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "k": pa.array([7, 8], pa.int64())}),
        root / "a-new-gen.parquet",
    )
    pq.write_table(pa.table({"id": pa.array([3], pa.int64())}), root / "b-old-gen.parquet")
    (root / "junk.parquet").write_bytes(b"junk")

    native, _ = read_parquet_resilient(spark, str(root))
    manifest, _ = read_parquet_resilient(spark, str(root), manifest_threshold=0)
    assert sorted(manifest.columns) == sorted(native.columns)
    rn = sorted(map(tuple, native.collect()))
    rm = sorted(map(tuple, manifest.select(*native.columns).collect()))
    assert rn == rm == [(1, 7), (2, 8), (3, None)]


def test_manifest_mode_schema_evolution_unfavorable_ordering(spark, tmp_path):
    """ADVICE r4: when the OLD generation sorts lexicographically first,
    a single-footer schema sample silently drops the new generation's
    columns. The manifest schema now unions the first AND last good
    footers, so the evolved column survives either sort position."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "evolved_rev"
    root.mkdir()
    pq.write_table(pa.table({"id": pa.array([3], pa.int64())}), root / "a-old-gen.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "k": pa.array([7, 8], pa.int64())}),
        root / "z-new-gen.parquet",
    )
    (root / "junk.parquet").write_bytes(b"junk")

    manifest, _ = read_parquet_resilient(spark, str(root), manifest_threshold=0)
    assert set(manifest.columns) == {"id", "k"}  # evolved column SURVIVES
    rows = sorted(map(tuple, manifest.select("id", "k").collect()))
    assert rows == [(1, 7), (2, 8), (3, None)]


def test_manifest_mode_schema_evolution_midsort_generation(spark, tmp_path):
    """A generation hidden STRICTLY mid-sort (neither first nor last
    path) is covered by the hash-sampled footers in the schema union —
    with <= 6 good files every footer is sampled, so the evolved
    column survives deterministically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "evolved_mid"
    root.mkdir()
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), root / "a-old.parquet")
    pq.write_table(
        pa.table({"id": pa.array([2], pa.int64()), "k": pa.array([9], pa.int64())}),
        root / "m-new.parquet",
    )
    pq.write_table(pa.table({"id": pa.array([3], pa.int64())}), root / "z-old.parquet")

    manifest, _ = read_parquet_resilient(spark, str(root), manifest_threshold=0)
    assert set(manifest.columns) == {"id", "k"}
    rows = sorted(map(tuple, manifest.select("id", "k").collect()))
    assert rows == [(1, None), (2, 9), (3, None)]

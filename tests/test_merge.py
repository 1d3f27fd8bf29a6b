"""MERGE emulation: upsert + SCD2 history semantics."""

from __future__ import annotations

from datetime import datetime

from etl_orders_spark.operators.merge import merge_upsert, scd2_apply


def test_merge_upsert_source_wins(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    source = spark.createDataFrame([(2, "B!"), (4, "d")], "id long, v string")
    out = {r["id"]: r["v"] for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: "a", 2: "B!", 3: "c", 4: "d"}


def test_scd2_closes_and_appends(spark):
    t0 = datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [
            (1, "alice@a", t0, None, True),
            (2, "bob@b", t0, None, True),
            (3, "old@x", t0, datetime(2024, 2, 1), False),  # history row
            (3, "new@x", datetime(2024, 2, 1), None, True),
        ],
        "id long, email string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame([(1, "alice@new")], "id long, email string")
    eff = datetime(2024, 3, 1)
    out = scd2_apply(dim, updates, ["id"], eff)
    rows = sorted(
        ((r["id"], r["email"], r["is_current"], r["valid_to"]) for r in out.collect())
    )
    # id 1: old version closed at eff, new version current
    assert (1, "alice@a", False, eff) in rows
    assert (1, "alice@new", True, None) in rows
    # id 2 untouched-current; id 3 history + current untouched
    assert (2, "bob@b", True, None) in rows
    assert (3, "old@x", False, datetime(2024, 2, 1)) in rows
    assert (3, "new@x", True, None) in rows
    assert len(rows) == 5
    # exactly one current row per key
    cur = [r for r in rows if r[2]]
    assert sorted(r[0] for r in cur) == [1, 2, 3]


def test_scd2_idempotent_for_no_updates(spark):
    t0 = datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [(1, "a@a", t0, None, True)],
        "id long, email string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    empty = spark.createDataFrame([], "id long, email string")
    out = scd2_apply(dim, empty, ["id"], datetime(2024, 3, 1))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))


def test_scd2_rejects_duplicate_update_keys(spark):
    """Two update rows for one key in a batch would open two identical
    current versions — the operator must fail loudly instead."""
    import pytest
    from pyspark.sql import functions as F

    from etl_orders_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:00:00", None, True)],
        "k long, v string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "v",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    dups = spark.createDataFrame([(1, "b"), (1, "c")], "k long, v string")
    with pytest.raises(ValueError, match="multiple rows"):
        scd2_apply(dim, dups, ["k"], "2024-02-01 00:00:00")

def test_snapshot_as_of_reconstructs_each_era(spark):
    """One key, three versions: the as-of read returns exactly the
    version whose interval contains the timestamp, nothing before the
    key existed, and the open (NULL valid_to) version afterward."""
    from etl_orders_spark.operators.merge import snapshot_as_of

    t1, t2 = datetime(2024, 2, 1), datetime(2024, 3, 1)
    hist = spark.createDataFrame(
        [
            (1, "v1", datetime(2024, 1, 1), t1, False),
            (1, "v2", t1, t2, False),
            (1, "v3", t2, None, True),
        ],
        "id long, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )

    def at(ts):
        return [r["v"] for r in snapshot_as_of(hist, ts).collect()]

    assert at(datetime(2023, 12, 31)) == []          # before the key existed
    assert at(datetime(2024, 1, 15)) == ["v1"]
    assert at(t1) == ["v2"]                          # boundary: close-at-open, new wins
    assert at(datetime(2024, 2, 15)) == ["v2"]
    assert at(datetime(2030, 1, 1)) == ["v3"]        # open interval = still current


def test_publish_parquet_versioned_atomicity_and_gc(spark, tmp_path):
    """The versioned publish survives the crash window a bare
    overwrite cannot: an interrupted publish (simulated as a dangling
    v_<n> dir with no pointer flip) leaves readers on the last good
    version; successful publishes bump the pointer atomically and
    garbage-collect old versions beyond `keep`."""
    import os

    from etl_orders_spark.operators.merge import (
        publish_parquet_versioned,
        read_published,
    )

    root = str(tmp_path / "serving")
    assert read_published(spark, root) is None  # never published

    publish_parquet_versioned(spark.range(3).selectExpr("id", "id * 2 AS v"), root)
    assert sorted(r["v"] for r in read_published(spark, root).collect()) == [0, 2, 4]

    # simulate a publish killed after the directory write, before the
    # pointer flip: readers must still resolve v_1. Backdate the
    # dangling claim past the GC grace window so it reads as
    # crashed-and-abandoned, not a concurrent publish mid-write.
    os.makedirs(os.path.join(root, "v_2"))
    stale = os.path.getmtime(os.path.join(root, "v_2")) - 7200
    os.utime(os.path.join(root, "v_2"), (stale, stale))
    assert sorted(r["v"] for r in read_published(spark, root).collect()) == [0, 2, 4]

    # the next successful publish claims v_3 and readers move forward;
    # retention counts PUBLISHED versions, so the stale dangling v_2 is
    # garbage-collected while v_1 — the version a straggling reader
    # may still be scanning — SURVIVES (a raw directory count would
    # have deleted v_1 and kept the garbage)
    publish_parquet_versioned(spark.range(2).selectExpr("id", "id + 10 AS v"), root)
    assert sorted(r["v"] for r in read_published(spark, root).collect()) == [10, 11]
    with open(os.path.join(root, "_LATEST")) as f:
        assert f.readline().strip() == "v_3"
    dirs = {d for d in os.listdir(root) if d.startswith("v_")}
    assert dirs == {"v_1", "v_3"}

    # keep=2: after one more publish the oldest PUBLISHED version is
    # gone but the immediately-previous one survives (reader grace)
    publish_parquet_versioned(spark.range(1).selectExpr("id", "id AS v"), root)
    dirs = {d for d in os.listdir(root) if d.startswith("v_")}
    assert dirs == {"v_3", "v_4"}

    # a FRESH dangling claim (a concurrent publisher mid-write) must
    # survive GC — only stale abandoned claims are collected — and its
    # claimed number can never be reused: the next publish skips to v_6
    os.makedirs(os.path.join(root, "v_5"))
    publish_parquet_versioned(spark.range(1).selectExpr("id", "id + 99 AS v"), root)
    with open(os.path.join(root, "_LATEST")) as f:
        assert f.readline().strip() == "v_6"
    assert os.path.isdir(os.path.join(root, "v_5"))  # fresh claim untouched
    dirs = {d for d in os.listdir(root) if d.startswith("v_")}
    assert dirs == {"v_4", "v_5", "v_6"}


def test_publish_lost_pointer_race_keeps_committed_version(spark, tmp_path):
    """ADVICE r5 (self-review): a publisher whose pointer flip lost the
    last-writer-wins race is absent from every later pointer history —
    GC retention is therefore MARKER-based, so its fully-committed
    directory survives even once stale, and only truly-uncommitted
    claims are collected."""
    import os

    from etl_orders_spark.operators.merge import (
        publish_parquet_versioned,
        read_published,
    )

    root = str(tmp_path / "serving")
    publish_parquet_versioned(spark.range(1).selectExpr("id", "id AS v"), root)  # v_1
    # Simulate publisher B: committed v_2 (data + marker) whose pointer
    # flip was overwritten — the pointer still says v_1, and v_2 never
    # appears in any history line.
    spark.range(2).selectExpr("id", "id + 50 AS v").write.parquet(
        os.path.join(root, "v_2")
    )
    with open(os.path.join(root, "v_2", "_COMMITTED"), "w"):
        pass
    stale = os.path.getmtime(os.path.join(root, "v_2")) - 7200
    os.utime(os.path.join(root, "v_2"), (stale, stale))  # well past grace

    publish_parquet_versioned(spark.range(3).selectExpr("id", "id AS v"), root)  # v_3
    dirs = {d for d in os.listdir(root) if d.startswith("v_")}
    # keep=2 committed -> {v_3, v_2}; v_1 (committed, beyond keep) GC'd;
    # the race-losing v_2 is RETAINED despite being stale and unlisted
    assert dirs == {"v_2", "v_3"}
    assert sorted(r["v"] for r in read_published(spark, root).collect()) == [0, 1, 2]


def test_publish_parquet_versioned_concurrent_publishers(spark, tmp_path):
    """Four ACTUAL concurrent publishers (threads sharing the session):
    every publisher gets a distinct version directory (mkdir claim),
    every committed directory survives GC with its marker, the pointer
    resolves one of the committed versions, and no publish's data is
    lost or interleaved."""
    import os
    import threading

    from etl_orders_spark.operators.merge import (
        publish_parquet_versioned,
        read_published,
    )

    root = str(tmp_path / "serving")
    results: dict[int, str] = {}
    errors: list[Exception] = []

    def publish(i: int) -> None:
        try:
            df = spark.range(10).selectExpr("id", f"id + {i * 100} AS v")
            results[i] = publish_parquet_versioned(df, root, keep=4)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=publish, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    vdirs = set(results.values())
    assert len(vdirs) == 4  # no two publishers shared a directory
    for i, vdir in results.items():
        assert os.path.exists(os.path.join(vdir, "_COMMITTED"))
        vals = sorted(
            r["v"] for r in spark.read.parquet(vdir).collect()
        )
        assert vals == [i * 100 + k for k in range(10)]  # no interleave
    # the pointer names one committed, readable version
    served = read_published(spark, root)
    first = sorted(r["v"] for r in served.collect())[0]
    assert first % 100 == 0 and 0 <= first <= 300
    # no stage leftovers
    assert not [d for d in os.listdir(root) if d.startswith(".stage_")]

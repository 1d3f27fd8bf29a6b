"""snapshot_diff: change typing and null-safe comparison on handcrafted
rows (the registry query exercises scale shape; this pins semantics)."""

from __future__ import annotations

from etl_orders_spark.operators.snapshot_diff import snapshot_diff

_SCHEMA = "k long, status string, amount double"


def test_all_change_types_and_null_safety(spark):
    old = spark.createDataFrame(
        [
            (1, "open", 10.0),   # unchanged -> dropped
            (2, "open", 10.0),   # status change
            (3, None, 5.0),      # NULL -> value counts as change
            (4, "done", None),   # value -> NULL counts as change
            (5, None, None),     # NULL == NULL -> unchanged, dropped
            (6, "gone", 1.0),    # deleted
        ],
        _SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (1, "open", 10.0),
            (2, "closed", 10.0),
            (3, "filled", 5.0),
            (4, "done", 3.0),
            (5, None, None),
            (7, "fresh", 2.0),   # inserted
        ],
        _SCHEMA,
    )
    got = {
        r.k: (r.change_type, list(r.changed_cols))
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("update", ["status"]),
        3: ("update", ["status"]),
        4: ("update", ["amount"]),
        6: ("delete", []),
        7: ("insert", []),
    }


def test_multi_column_update_sorted(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], _SCHEMA)
    new = spark.createDataFrame([(1, "b", 2.0)], _SCHEMA)
    row = snapshot_diff(old, new, ["k"]).collect()[0]
    assert row.change_type == "update"
    assert list(row.changed_cols) == ["amount", "status"]  # sorted

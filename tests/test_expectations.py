"""Expectations operator: violation arithmetic on deliberately dirty
data (the registry's dq_orders_lineitem runs on clean fixtures, so the
counting itself must be proven here), NULL-predicate semantics, and
the single-aggregate plan shape."""

from __future__ import annotations

from etl_orders_spark.operators.expectations import (
    in_range,
    in_set,
    matches,
    not_null,
    ref_integrity,
    run_row_checks,
    violating_rows,
)

_SCHEMA = "id long, grade string, score double"
_ROWS = [
    (1, "A", 10.0),
    (2, "B", -5.0),   # range violation
    (3, None, 20.0),  # null grade, in_set/matches violations too
    (3, "Z", None),   # dup id, bad grade, null score (range counts NULL as violation)
]


def _result(df):
    return {r.check: (r.violations, r.total) for r in df.collect()}


def test_row_checks_count_violations(spark):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    got = _result(
        run_row_checks(
            df,
            [
                not_null("grade"),
                in_set("grade", ["A", "B"]),
                matches("grade", "^[A-C]$"),
                in_range("score", 0.0, 100.0),
            ],
            unique_keys=["id"],
        )
    )
    assert got == {
        "not_null:grade": (1, 4),
        "in_set:grade": (2, 4),    # NULL and 'Z'
        "matches:grade": (2, 4),   # NULL and 'Z'
        "in_range:score": (2, 4),  # -5.0 and NULL
        "unique:id": (1, 4),
    }


def test_clean_table_passes(spark, sf_dir):
    from etl_orders_spark.sources.readers import load_table

    got = _result(
        run_row_checks(
            load_table(spark, sf_dir, "orders"),
            [not_null("o_orderdate"), in_set("o_orderstatus", ["O", "F", "P"])],
            unique_keys=["o_orderkey"],
        )
    )
    assert all(v == 0 for v, _ in got.values())


def test_ref_integrity_counts_orphans(spark):
    fact = spark.createDataFrame([(1, "x"), (2, "y"), (9, "z"), (9, "w")], "fk long, v string")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = ref_integrity(fact, "fk", dim, "pk").collect()[0]
    assert (row.check, row.violations, row.total) == ("ref:fk->pk", 2, 4)


def test_violating_rows_includes_null_predicates(spark):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    bad = violating_rows(df, in_range("score", 0.0, 100.0))
    assert sorted(r.id for r in bad.collect()) == [2, 3]


def test_row_checks_single_aggregate_plan(spark):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    plan = run_row_checks(
        df, [not_null("grade"), in_range("score", 0.0, 100.0)], unique_keys=["id"]
    )._jdf.queryExecution().optimizedPlan().toString()
    # every check folds into ONE Aggregate node - no per-check scans
    assert plan.count("Aggregate") == 1


def test_reconciliation_counts_consistent(spark, sf_dir):
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.sources.readers import load_table

    r = query_map()["reconcile_order_totals"](spark, sf_dir).collect()[0]
    assert r.n_orders == load_table(spark, sf_dir, "orders").count()
    assert 0 <= r.n_exact <= r.n_within_1pct <= r.n_orders
    if r.n_exact == r.n_orders:
        assert r.total_abs_diff_cents == 0


def test_table_fingerprints_cover_all_tables(spark, sf_dir):
    from etl_orders_spark.plans.registry import query_map
    from etl_orders_spark.sources.readers import TABLES

    rows = {r.tbl: r for r in query_map()["table_fingerprints"](spark, sf_dir).collect()}
    assert set(rows) == set(TABLES)
    for t, r in rows.items():
        assert r.n_rows > 0 and r.key_min <= r.key_max
        assert r.key_ndv <= r.n_rows


def test_psi_zero_when_periods_identical(spark):
    """PSI semantics pinned: identical distributions drift zero, a
    moved bucket drifts positive in exactly that bucket's terms."""
    from pyspark.sql import functions as F

    import etl_orders_spark.plans.dq_queries as DQ

    # 1995 and 1999 rows with IDENTICAL price histograms -> every
    # bin has p_ppm == q_ppm -> psi_pico == 0 in every bin
    rows = [
        (k, float(p), d)
        for k, (p, d) in enumerate(
            [(price, year) for price in (10_000.0, 60_000.0, 120_000.0, 390_000.0)
             for year in ("1995-06-01", "1999-06-01")]
        )
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double, o_orderdate string")
    orig = DQ.T
    DQ.T = lambda spark_, sf_, name: df  # noqa: E731
    try:
        out = {r.bin: r for r in DQ.dq_psi_price_drift(spark, "unused").collect()}
    finally:
        DQ.T = orig
    assert out, "no bins produced"
    for b, r in out.items():
        assert r.n_ref == r.n_cur, f"bin {b} fixture not symmetric"
        assert r.psi_pico == 0, f"identical periods must not drift (bin {b})"
        assert r.p_ppm == r.q_ppm


def test_row_checks_empty_frame_gates_clean(spark):
    """SUM over an empty frame is NULL — violations must still read 0
    so an empty-but-clean load passes a `violations == 0` gate."""
    from etl_orders_spark.operators.expectations import not_null, run_row_checks

    df = spark.createDataFrame([], "x long").filter("x > 0")
    rows = run_row_checks(df, [not_null("x")]).collect()
    assert [(r.violations, r.total) for r in rows] == [(0, 0)]

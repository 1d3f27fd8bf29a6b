"""MERGE-style mutation patterns without a table format: upsert and
SCD2 history, emulated with anti-join + union (+ window-free column
logic). With Delta/Iceberg these become `MERGE INTO`; the relational
emulation here is format-agnostic and works over plain parquet with
an overwrite-rewrite (the reference's own full-refresh load semantics,
reference: dags/etl.py:218-235, upgraded to keyed merges).

Scale: both patterns are one keyed join (shuffle on the merge key) +
a union — no windows over the full table, no driver involvement. The
rewrite cost is the table scan itself; with a partitioned layout only
touched partitions need rewriting (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """UPSERT: source rows win on key collision, target rows survive
    otherwise. Schemas must match by name."""
    return target.join(source.select(*keys), keys, "left_anti").unionByName(source)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of
    each updated key (valid_to = effective_ts, is_current = false) and
    append the update as the new current version.

    `dim` must carry the three SCD columns; `updates` carries the
    business columns only. History rows pass through untouched.

    PRECONDITION (enforced): `updates` has at most one row per key —
    duplicates in one batch would each open an is_current version with
    the same valid_from, permanently double-counting the key in every
    `is_current` read. Callers with replayed/late batches must collapse
    to latest-per-key first (max_by on their own ordering column); this
    operator cannot pick for them, so it fails loudly instead.
    """
    eff = F.lit(effective_ts).cast("timestamp")
    # one materialization serves the precondition check AND the merge's
    # two consumers (upd_keys, fresh) — without it the full updates
    # lineage (often a join/agg pipeline) executes three times
    updates = updates.localCheckpoint(eager=True)
    dup = (
        updates.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"scd2_apply: updates batch has multiple rows for key {dup[0][:len(keys)]}; "
            "collapse to one row per key before applying (an SCD2 batch defines ONE "
            "new version per key)"
        )
    upd_keys = updates.select(*keys).distinct()
    # current rows being superseded -> closed
    closing = (
        dim.filter(F.col(is_current))
        .join(upd_keys, keys, "left_semi")
        .withColumn(valid_to, eff)
        .withColumn(is_current, F.lit(False))
    )
    # everything else (history + current rows without an update) passes through
    untouched_current = dim.filter(F.col(is_current)).join(upd_keys, keys, "left_anti")
    history = dim.filter(~F.col(is_current))
    fresh = (
        updates.withColumn(valid_from, eff)
        .withColumn(valid_to, F.lit(None).cast("timestamp"))
        .withColumn(is_current, F.lit(True))
    )
    return history.unionByName(untouched_current).unionByName(closing).unionByName(fresh)


def snapshot_as_of(
    dim: DataFrame,
    ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (time-travel) read over an SCD2 history: the
    version of each key visible at ``ts`` is the one whose validity
    interval contains it — ``valid_from <= ts < valid_to`` with an open
    ``valid_to`` (NULL) meaning "still current". Keys first created
    after ``ts`` simply don't appear, and at most one version per key
    can match because scd2_apply closes the old version at exactly the
    instant it opens the new one.

    Scale: a pure filter — it pushes into the history table's scan
    (parquet min/max on valid_from prunes whole files once history is
    written time-ordered), no join and no shuffle."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col(valid_from) <= t) & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )

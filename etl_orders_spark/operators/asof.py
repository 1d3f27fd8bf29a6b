"""As-of and range joins — operators Spark lacks natively (SURVEY.md §2.3 J4).

Both are built as compositions of existing DataFrame ops (join +
window / join + interval predicate) per the build rules: no Python in
the row path, fully planned by Catalyst.

Scale notes:
- `asof_join` is equi-join on the `by` key + window top-1. The shuffle
  is on the by-key (same as any keyed join); the window then works
  within each joined group. For a by-key-less as-of (pure time), range
  bucketing (below) bounds the candidate set instead.
- `range_join` keeps an equality conjunct so Catalyst plans a hash /
  sort-merge join with the range as a post-filter — not a cartesian
  product. For range-only joins, bucket the time axis first so the
  equality conjunct exists (`bucket = floor(epoch/width)` + explode to
  neighbor buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_on: str,
    right_on: str,
    by_left: str,
    by_right: str,
    tie_break: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row (identified by the unique column `left_key`),
    attach the single right row with the largest `right_on` ≤ `left_on`
    (backward; 'forward' = smallest ≥) within the same `by` group.
    Right rows tied on `right_on` break by descending `tie_break` (a
    unique right column) so the result is deterministic.

    Left rows with no match are kept with null right columns
    (merge_asof semantics).
    """
    # frame-qualified references: the canonical as-of shape names both
    # time (and both by) columns identically — bare F.col() would be
    # ambiguous across the join sides and throw at analysis time
    if direction == "backward":
        cond = right[right_on] <= left[left_on]
        order = [right[right_on].desc(), right[tie_break].desc()]
    elif direction == "forward":
        cond = right[right_on] >= left[left_on]
        order = [right[right_on].asc(), right[tie_break].asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    joined = left.join(right, (left[by_left] == right[by_right]) & cond, "left")
    w = Window.partitionBy(left[left_key]).orderBy(*order)
    # rank only real matches; unmatched left rows survive as the single null row
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) | right[right_on].isNull())
        .drop("_rn")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_left: str,
    equi_right: str,
    range_cond: Column,
) -> DataFrame:
    """Join on an equality key plus an arbitrary range predicate. The
    equality keeps the plan a keyed join (shuffle on the key); the range
    condition is evaluated inside the join."""
    return left.join(right, (F.col(equi_left) == F.col(equi_right)) & range_cond, "inner")

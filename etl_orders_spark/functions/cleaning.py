"""Value-normalization expressions (SURVEY.md §2.2: P5 recode, P6 truncation).

The reference's transforms are whole-table pandas functions
(`Gender.replace({'Male':'M','f':'F'})`, reference: dags/etl.py:60;
`BirthDay.str.split('T').str[0]`, reference: dags/etl.py:63-64). Here
each is a Column expression — codegen'd JVM-side, no Python in the hot
path, composable inside any select.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def recode(col: Column | str, mapping: Mapping[str, str], default_passthrough: bool = True) -> Column:
    """P5 — conditional value recode.

    ``recode("gender", {"Male": "M", "f": "F"})`` builds the CASE chain
    `WHEN c='Male' THEN 'M' WHEN c='f' THEN 'F' ELSE c END`. Unlike the
    reference's `.replace` (substring-safe only by luck), this is exact
    full-value matching and stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for old, new in mapping.items():
        cond = c == F.lit(old)
        expr = F.when(cond, F.lit(new)) if expr is None else expr.when(cond, F.lit(new))
    if expr is None:
        return c
    return expr.otherwise(c) if default_passthrough else expr


def truncate_iso_date(col: Column | str) -> Column:
    """P6 — ISO-8601 timestamp-string → date-string truncation.

    `1967-02-20T00:00:00` → `1967-02-20` (reference: dags/etl.py:63-64
    does it with `.str.split('T').str[0]`). `substring_index` keeps it
    a pure string op; callers wanting a typed DateType chain `to_date`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "T", 1)


def clean_priority(col: Column | str) -> Column:
    """Strip the numeric prefix of TPC-H style priorities
    ('1-URGENT' → 'URGENT') — same shape as the reference's dirty
    categorical cleanup, applied to the driver's orders table."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "-", -1)

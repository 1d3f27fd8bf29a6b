"""Materialize a small multi-consumer frame exactly once.

The trap this exists for: a DataFrame consumed by two or more
downstream subtrees is not "computed once and shared" — Catalyst
re-derives the WHOLE lineage per consumer, and exchange reuse only
unifies canonically-identical subplans (renamed, re-filtered, or
re-aggregated branches never qualify; nondeterministic expressions
like spark_partition_id disqualify outright). The runtime scan audit
(tools/scan_audit.py) caught a dozen plans silently paying 3-8 full
fact scans this way.

``materialize_small`` is the decision marker: call it ONLY on frames
that are provably small at any scale (cell tables bounded by category
cardinalities, day/month-grain series bounded by the calendar,
per-type sketch tables) — materializing something that grows with the
data (an explode output, a fact projection) can cost more than the
re-scan it saves, which is why this is an explicit opt-in and not a
blanket rule. Eager local checkpoint: computed now, lineage
truncated, every consumer reads the stored blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_small(df: DataFrame) -> DataFrame:
    """Eagerly materialize a PROVABLY-SMALL multi-consumer frame."""
    return df.localCheckpoint(eager=True)

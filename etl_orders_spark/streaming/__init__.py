"""Structured Streaming twins of the batch time/events layer
(SURVEY.md §2.5 phase 7).

The reference has no streaming; its only time notion is the daily
Airflow trigger (reference: dags/etl.py:152-154). Here the batch
window queries (plans/time_queries.py) and these streaming forms share
the same aggregation builders — one definition, two execution modes —
so batch-equivalence is testable with Trigger.AvailableNow.

Scale notes: watermarks bound state (late data beyond the watermark is
dropped); `dropDuplicatesWithinWatermark` keeps the dedup state
windowed instead of unbounded; session windows use the native
`F.session_window` state store implementation.
"""

from etl_orders_spark.streaming.stateful import (
    compact_fingerprint_index,
    first_seen_dedup,
    first_seen_dedup_with_index,
)
from etl_orders_spark.streaming.windows import (
    attribute_conversions,
    dedup_within_watermark,
    run_available_now_to_memory,
    session_window_stats,
    sliding_counts,
    tumbling_agg,
)

__all__ = [
    "attribute_conversions",
    "compact_fingerprint_index",
    "first_seen_dedup",
    "first_seen_dedup_with_index",
    "dedup_within_watermark",
    "run_available_now_to_memory",
    "session_window_stats",
    "sliding_counts",
    "tumbling_agg",
]

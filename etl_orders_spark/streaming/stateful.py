"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in windowed aggregations can't express —
arbitrary per-key running state with timeout-driven eviction — Spark's
escape hatch is `applyInPandasWithState`: state lives in the state
store keyed by group, micro-batches arrive as Arrow-backed pandas
frames. Used sparingly: everything expressible as a window/agg stays
JVM-side (streaming/windows.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

RUNNING_STATS_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
_STATE_SCHEMA = "n long, total double, mx double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over an event stream: state
    persists across micro-batches in the state store; each batch emits
    the refreshed row per active user. Batch input falls back to a
    plain aggregate (identical final answer on finite data).

    The state-update function is a closure so it pickles by value —
    Python workers never need this package importable."""
    from pyspark.sql import functions as F

    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").cast("double").alias("total_value"),
            F.max("value").cast("double").alias("max_value"),
        )

    def update_running_stats(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.exists:
            n, total, mx = state.get
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            [(key[0], n, total, mx)],
            columns=["user_id", "n_events", "total_value", "max_value"],
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_running_stats,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 [EXT] 'custom stateful operators').

Running per-user event accumulator: for each user, maintain (n_events,
sum_value, last_seen_epoch) across micro-batches; emit the updated
snapshot each batch and drop state for users idle past the timeout.
This is the engine's template for operators Spark's built-in windowed
aggs can't express (per-key custom transition functions).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, sum_value double, last_seen long"
OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_seen long"


def _update(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # Timestamp.timestamp() is unit-agnostic (pandas may hand the
        # Arrow batch over as datetime64[us] or [ns]; a raw int64 view
        # would silently change scale with the pandas/Arrow version).
        last = max(last, int(pd.Timestamp(pdf["ts"].max()).timestamp()))
    state.update((n, total, last))
    state.setTimeoutDuration(60 * 60 * 1000)  # 1h idle → state dropped
    yield pd.DataFrame(
        [(user_id, n, total, last)],
        columns=["user_id", "n_events", "sum_value", "last_seen"],
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream → per-user running snapshot (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

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


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same running snapshot on Spark 4's transformWithStateInPandas —
    the successor stateful API (SPARK-49564): typed state handles
    (value/list/map + TTL + timers) on an object-oriented processor
    instead of applyInPandasWithState's single state tuple. Kept
    alongside the classic form so both engine surfaces stay exercised;
    the test pins both to the identical batch answer.

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``). In THIS
    container the feature's separate Python "driver worker" crashes on
    the canonical upstream example too (state-server handshake), so the
    test skips with that reason — the operator is exercised wherever
    the runtime supports it."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total, last = (
                self._totals.get() if self._totals.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                # unit-agnostic, same as _update above
                last = max(last, int(pd.Timestamp(pdf["ts"].max()).timestamp()))
            self._totals.update((n, total, last))
            yield pd.DataFrame(
                [(key[0], n, total, last)],
                columns=["user_id", "n_events", "sum_value", "last_seen"],
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY engine mapping for "custom stateful operators").

``running_user_totals`` keeps one state row per user (event count +
value sum) and, in update mode, emits the refreshed cumulative totals
for every user seen in the micro-batch. Because the engine's chunked
file stream assigns rows to batches by a deterministic global rank, the
(user, batch) -> cumulative-totals output is fully reproducible and
oracle-checkable in SQL.

Scale: state is keyed by user and partitioned across executors by the
shuffle on the grouping key; each state row is two numbers, so state
size is O(distinct users), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, batch int, events_so_far long, value_sum double"
STATE_SCHEMA = "events long, value_sum double, batch int"


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        events, value_sum, batch = state.get
    else:
        events, value_sum, batch = 0, 0.0, -1
    new_events = 0
    new_sum = 0.0
    for pdf in pdfs:
        new_events += len(pdf)
        new_sum += float(pdf["value"].sum())
    events += new_events
    # value sums are rounded at emit; accumulate raw
    value_sum += new_sum
    batch += 1
    state.update((events, value_sum, batch))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch": [batch],
            "events_so_far": [events],
            "value_sum": [round(value_sum, 2)],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value-sum) emitted each micro-batch
    the user appears in. ``batch`` is the per-user occurrence index (how
    many batches have included this user so far, 0-based)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4.x successor API)
# ---------------------------------------------------------------------------

try:  # pragma: no cover - availability probe
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class RunningTotalsProcessor(StatefulProcessor):
    """``transformWithStateInPandas`` flavor of ``running_user_totals``
    — same state (per-user count + value sum + occurrence index), same
    emission contract, on the Spark 4.x successor API. Differences that
    matter at scale vs applyInPandasWithState: typed state handles
    (value/list/map) instead of one opaque tuple, per-key timers for
    TTL/eviction without a watermark hack, and the RocksDB state store
    (required by this API) which spills state to disk instead of
    holding it on the JVM heap — the difference between O(heap) and
    O(disk) keyed state at 100 TB."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._totals.exists():
            events, value_sum, batch = self._totals.get()
        else:
            events, value_sum, batch = 0, 0.0, -1
        for pdf in rows:
            events += len(pdf)
            value_sum += float(pdf["value"].sum())
        batch += 1
        self._totals.update((events, value_sum, batch))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch": [batch],
                "events_so_far": [events],
                "value_sum": [round(value_sum, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """``running_user_totals`` on transformWithStateInPandas; requires
    the RocksDB state store provider (set by the caller before start)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )

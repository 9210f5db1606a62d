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

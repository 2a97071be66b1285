"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.7 / north star: "applyInPandasWithState for custom stateful
operators").

``running_user_totals`` keeps one state row per user — cumulative spend,
event count, last-seen timestamp — and emits the updated totals for
every user touched in each micro-batch. This is the canonical shape for
operators windowed aggregation can't express: the state transition is
arbitrary Python over Arrow batches, while Spark handles partitioning
(state lives with its key's shuffle partition), checkpointing, and
recovery.

Scale: state is O(distinct keys), sharded across executors by the
groupBy key; per-batch work is O(batch) — nothing driver-side.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_user(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    total, n, last_us = state.get if state.exists else (0.0, 0, 0)
    for pdf in batches:
        total += float(pdf["value"].fillna(0.0).sum())
        n += int(len(pdf))
        ts_max = pdf["ts"].max()
        if pd.notna(ts_max):
            last_us = max(last_us, int(ts_max.value // 1_000))
    state.update((total, n, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_value": [total],
            "n_events": [n],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals over the event stream (update mode)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

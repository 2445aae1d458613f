"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9's Spark mapping for custom stateful ops).

``running_totals`` keeps one state row per key (event count, value sum, last
event time) and emits the updated totals for every key touched by a batch —
the standard shape for per-entity accumulators (per-trip progress trackers,
per-user quotas, per-document pipeline counters) that no built-in streaming
aggregate expresses when the update logic grows beyond algebraic aggregates.

Arrow-batched Pandas on the executor — state is a single tuple per key, so
state-store size is O(distinct keys) and eviction can be added with a
ProcessingTimeTimeout when keys churn.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, vsum, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, vsum, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n_events": [n],
            "value_sum": [vsum],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_totals(df: DataFrame) -> DataFrame:
    """Per-(user, event_type) running totals; emits current totals for every
    key seen in each micro-batch (update semantics)."""
    return df.groupBy("user_id", "event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

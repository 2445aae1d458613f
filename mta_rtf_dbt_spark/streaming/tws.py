"""Composite-state streaming operator on ``transformWithStateInPandas``
(Spark 4's typed-state successor to ``applyInPandasWithState``).

Where :mod:`.stateful`'s running_totals carries one flat tuple per key, this
operator keeps a per-user **profile** out of two independent state variables:

- ``totals``   (ValueState)  — event count + value sum,
- ``by_type``  (MapState)    — per-event-type counters, updated point-wise
  (RocksDB mutates only the touched map entries — the whole point of the new
  API: no read-modify-write of a monolithic state blob as keys widen).

Each micro-batch emits the refreshed profile for every touched user:
``(user_id, n_events, value_sum, n_types, top_type)`` with top_type resolved
deterministically (max count, then lexicographically smallest type).

Requires the RocksDB state store (Spark bundles it);
:func:`user_activity_profile` pins the provider on the session.

**Environment gate:** the TWS state-server protocol needs ``protobuf``, which
this container lacks (no installs allowed). :func:`tws_available` probes for
it; when absent, :func:`user_activity_profile` transparently falls back to an
``applyInPandasWithState`` implementation with the *identical* output
contract — the map state is carried as two parallel arrays inside the one
state blob, which is exactly the monolithic read-modify-write the typed-state
API exists to avoid. Same operator, same oracle; the backend upgrades itself
where the dependency exists.

Scale posture: state is partitioned by user_id across
``spark.sql.streaming.stateStore`` instances; per-key state is O(distinct
event types) and the map updates are point writes, so a 1000-executor
cluster shards billions of users with no per-batch state rewrite.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, n_types long, top_type string"
)


class UserProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, vsum double")
        self._by_type = handle.getMapState("by_type", "etype string", "cnt long")

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: TimerValues
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, vsum = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            vsum += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, vsum))

        counts = [(k[0], v[0]) for k, v in self._by_type.iterator()]
        top_type = min(counts, key=lambda kv: (-kv[1], kv[0]))[0] if counts else None
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [vsum],
                "n_types": [len(counts)],
                "top_type": [top_type],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; absent in this container (TESTDATA.md environment)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _fallback_profile(df: DataFrame) -> DataFrame:
    """Same profile via applyInPandasWithState: the per-type map rides inside
    the single state tuple as parallel arrays (types, counts) — functionally
    identical, but every batch rewrites the whole blob."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, vsum, types, counts = state.get
            by_type = dict(zip(list(types), list(counts)))
        else:
            n, vsum, by_type = 0, 0.0, {}
        for pdf in pdfs:
            n += len(pdf)
            vsum += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                by_type[etype] = by_type.get(etype, 0) + int(cnt)
        state.update((n, vsum, list(by_type.keys()), list(by_type.values())))
        top_type = (
            min(by_type.items(), key=lambda kv: (-kv[1], kv[0]))[0] if by_type else None
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [vsum],
                "n_types": [len(by_type)],
                "top_type": [top_type],
            }
        )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="n long, vsum double, types array<string>, counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_activity_profile(df: DataFrame) -> DataFrame:
    """Per-user composite profile over a stream of events. ``df`` must have
    ``user_id``, ``event_type``, ``value`` columns. Uses typed TWS state when
    the environment supports it, else the flat-state fallback."""
    if not tws_available():
        return _fallback_profile(df)
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return df.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

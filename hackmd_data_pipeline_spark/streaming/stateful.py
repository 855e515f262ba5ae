"""Custom stateful streaming operator (SURVEY.md §2.I extension).

The reference has no custom per-key state beyond its Postgres control
tables; a streaming engine needs one. This module implements
per-user session tracking with ``applyInPandasWithState`` — the
Spark-native building block for operator semantics that watermarked
windows can't express (running per-key aggregates with custom expiry
logic).

Scale posture: state is partitioned by the grouping key across
executors and checkpointed by the streaming engine; each micro-batch
touches only keys present in the batch plus timed-out state. The
pandas UDF sees Arrow batches per key — no row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_sum", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("value_sum", T.DoubleType()),
])


def track_sessions(events: DataFrame) -> DataFrame:
    """Running per-user totals across micro-batches.

    Input: streaming DataFrame with ``user_id, ts, value``. Output per
    micro-batch: one row per touched key with totals accumulated over
    the whole stream — the state survives micro-batch boundaries via
    the checkpointed state store.

    (Inactivity expiry via GroupStateTimeout is deliberately NOT used
    here: processing-time timeouts keep scheduling micro-batches under
    trigger(availableNow) and never drain. Expiry belongs to a
    continuously-triggered deployment; drain-style runs get closed
    sessions from the batch sessionization query instead.)
    """

    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                            "value_sum": [v]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class RunningTotalsProcessor:
    """``transformWithStateInPandas`` twin of :func:`track_sessions` —
    the Spark-4-native arbitrary-state API (SPARK-46815): typed state
    handles (ValueState here; ListState/MapState/timers/TTL available)
    instead of a single packed tuple, backed by the RocksDB state
    store. Kept semantically IDENTICAL to the legacy operator so the
    equivalence test pins both APIs to one contract.

    Defined lazily as a plain class (pyspark's StatefulProcessor ABC
    imported at call time) so importing this module never requires the
    streaming-state machinery."""

    def init(self, handle):  # StatefulProcessorHandle
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        n, v = (0, 0.0)
        if self._totals.exists():
            n, v = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            v += float(pdf["value"].sum())
        self._totals.update((n, v))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "value_sum": [v]})

    def close(self):
        pass


def track_sessions_tws(events: DataFrame) -> DataFrame:
    """Running per-user totals via ``transformWithStateInPandas``.

    Same contract as :func:`track_sessions`; requires the RocksDB
    state store provider (``spark.sql.streaming.stateStore.
    providerClass`` — the new API refuses the default HDFS-backed
    store) and the ``protobuf`` python package at runtime (the state
    server speaks protobuf to the python worker; standard in a
    ``pyspark[connect]`` install, absent in this test container, so
    the equivalence test is import-gated). State layout here is a named ValueState per key; at 100 TB
    the posture is identical to the legacy operator (state partitioned
    by key, only touched keys per micro-batch) with finer-grained
    store updates."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _P(RunningTotalsProcessor, StatefulProcessor):
        pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_P(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )

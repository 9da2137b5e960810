"""Custom stateful streaming operators (``applyInPandasWithState``).

For semantics the built-in windowed aggregations can't express, the
supported extension point is arbitrary stateful processing over a
grouped stream: state lives in the state store partitioned by the
group key, updates arrive as Arrow batches, and the operator emits
any rows it likes per batch. This is the Spark-native home for the
"custom stateful operator" surface — per-key counters, anomaly
state machines, CDC reconciliation.

Only exact, order-insensitive statistics are kept in state here
(count / max / last-by-timestamp) so results are deterministic
regardless of batch partitioning — a float running sum would depend
on accumulation order and break oracle parity.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

USER_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_USER_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mx = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            batch_max = float(pdf["value"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, mx))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})


def user_running_stats(events: DataFrame) -> DataFrame:
    """Per-user cumulative event count and max value.

    Emits the updated totals for every user seen in each micro-batch
    (update semantics); after an AvailableNow pass over a bounded
    input the last emission per user equals the batch
    ``groupBy(user_id).agg(count, max)``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=_USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class _UserStatsProcessor:
    """transformWithStateInPandas twin of ``_update_user_stats`` — the
    Spark 4 arbitrary-state API (typed named state slots via a handle,
    per-key Arrow batches, explicit processor lifecycle) instead of the
    single implicit state tuple of applyInPandasWithState. Same exact,
    order-insensitive statistics, so both operators' final emissions
    agree batch-for-batch."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("user_stats", _USER_STATS_STATE)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, mx = self._state.get() if self._state.exists() else (0, None)
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                batch_max = float(pdf["value"].max())
                mx = batch_max if mx is None else max(mx, batch_max)
        self._state.update((n, mx))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs the RocksDB state store AND a
    working ``google.protobuf`` for its state-server protocol; this
    container ships no protobuf, so the runtime path is env-gated
    (same posture as delta-spark / PIL: implementation real, execution
    behind a probe)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_running_stats_tws(events: DataFrame) -> DataFrame:
    """``user_running_stats`` on ``transformWithStateInPandas`` —
    kept alongside the applyInPandasWithState version so both
    arbitrary-state APIs are exercised. Requires ``tws_available()``
    (protobuf) and the RocksDB state store provider:
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    """
    from pyspark.sql.streaming import StatefulProcessor

    class Proc(_UserStatsProcessor, StatefulProcessor):
        pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Proc(),
        outputStructType=USER_STATS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )

"""Arbitrary stateful per-key streaming with applyInPandasWithState.

The custom-operator escape hatch for streaming semantics the built-in
windows can't express (running per-user counters with custom emission
rules, model-ish accumulators, etc.). State is per key, partitioned by the
group key — the same shuffle as a streaming aggregate — and bounded by an
explicit timeout, which is the stateful-processing equivalent of a
watermark.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user (count, total value), emitted every micro-batch."""
    (user_id,) = key
    # GroupState.get is a *property* in PySpark 4 (raises if absent);
    # calling it only ever worked here because single-run tests start
    # with empty state — caught by the two-phase anomaly-detector test
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals over an event stream.

    groupBy(user_id) shuffles each key to a stable state partition;
    the pandas callback sees (key, new-rows, state) per micro-batch.
    Output mode 'update' emits one row per touched key per batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's typed-state successor to
# applyInPandasWithState: named state variables (value/list/map), timers,
# and TTL, on the RocksDB state store.
# --------------------------------------------------------------------------

try:  # Spark 4+; the runtime protocol additionally needs protobuf
    import google.protobuf  # noqa: F401  (TWS worker hard-requires it)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older PySpark / no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]
    HAS_TWS = False


class UserTotalsProcessor(StatefulProcessor):
    """Same running per-user totals as ``running_user_totals``, on the
    typed-state API: one ValueState per key instead of an opaque tuple.

    The state store is RocksDB (required by transformWithState), which is
    also the right 100 TB choice: state spills to disk per partition
    instead of living on the executor heap.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events LONG, total_value DOUBLE"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, total = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on transformWithStateInPandas.

    Requires the RocksDB state store provider (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` before starting the query).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

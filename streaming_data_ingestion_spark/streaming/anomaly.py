"""Streaming anomaly detection with per-key running statistics.

A custom stateful operator the built-in streaming aggregates can't express:
each event is z-scored against its key's running mean/variance *as of the
previous micro-batch*, so the detector never tests a point against
statistics that already include it (self-masking), and state is three
scalars per key — constant memory no matter how long the stream runs.

Same machinery as ``stateful.running_user_totals`` (applyInPandasWithState:
groupBy shuffles each key to a stable state partition; the pandas callback
sees (key, new-rows, state) per micro-batch), extended with emit-then-fold
ordering: score the batch against prior state first, then fold the batch
into state for the next one.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

Z_THRESHOLD = 3.0

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("s2", T.DoubleType()),
    ]
)


def _score_and_fold(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Score each chunk against state-so-far, then fold it into state."""
    (event_type,) = key
    # GroupState.get is a *property* in PySpark 4 (raises if absent)
    n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
    for pdf in pdfs:
        if n >= 2:
            mean = s / n
            var = (s2 - s * s / n) / (n - 1)
            std = math.sqrt(var) if var > 0 else 0.0
        else:
            mean, std = 0.0, 0.0
        v = pdf["value"].astype(float)
        z = (v - mean) / std if std > 0 else v * 0.0
        if std > 0:
            flag = z.abs() > Z_THRESHOLD
        elif n >= 2:
            # degenerate history (every prior value identical): any
            # deviation from that constant is an anomaly — without this
            # branch a zero-variance key would mask arbitrary level shifts
            flag = v != mean
        else:
            flag = pd.Series(False, index=pdf.index)
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": event_type,
                "value": v,
                "z": z,
                "is_anomaly": flag,
            }
        )
        n += len(v)
        s += float(v.sum())
        s2 += float((v * v).sum())
    state.update((n, s, s2))


def detect_value_anomalies(events: DataFrame) -> DataFrame:
    """Per-event-type streaming z-score detector over an event stream.

    Until a key has seen ≥2 prior events there is no variance estimate, so
    early events score z=0 / not anomalous — the standard cold-start rule.
    """
    return (
        events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _score_and_fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Streaming ALS fold-in: incremental per-user factor refresh.

The serving-side companion of ``ml/als.py``: with the item-factor
matrix V frozen (retrained offline on the trainer's cadence), a user's
ridge solve depends on their interactions only through MERGEABLE
moments — A_u = Σ v_i v_iᵀ and b_u = Σ r·v_i. Each interaction adds one
rank-1 update, so the streaming fold-in keeps exactly those moments as
per-user state and re-solves after every micro-batch: a new user gets
factors after their first event, an existing user's factors incorporate
every event seen so far, and the result is IDENTICAL to the batch user
step over the union of all batches (same normal equations — tested to
1e-9, the float-sum-order envelope).

Scale shape: state is (r² + r) doubles per user (rank 8 → 576 B),
keyed and shuffled exactly like a streaming aggregate; V rides into
the executors via the task closure (same budget argument as the batch
user step, ml/als.py). No timeout — factor state is the product, not a
window; a deployment that wants eviction bounds it with TTL the same
way the anomaly detector does.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _schemas(rank: int) -> tuple[T.StructType, T.StructType]:
    out = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_obs", T.LongType()),
            T.StructField("factors", T.ArrayType(T.DoubleType())),
        ]
    )
    state = T.StructType(
        [
            T.StructField("n_obs", T.LongType()),
            T.StructField("aa", T.ArrayType(T.DoubleType())),  # r*r flat
            T.StructField("bb", T.ArrayType(T.DoubleType())),  # r
        ]
    )
    return out, state


def streaming_user_factors(
    interactions: DataFrame,
    v: np.ndarray,
    item_ids: list[int],
    reg: float = 0.1,
) -> DataFrame:
    """(user_id, item, rating) stream → per-user factors, refreshed every
    micro-batch from accumulated normal-equation moments."""
    rank = int(v.shape[1])
    item_index = {int(it): pos for pos, it in enumerate(item_ids)}
    v_rows = [list(map(float, row)) for row in v]
    out_schema, state_schema = _schemas(rank)

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, aa_flat, bb = state.get
            a = np.array(aa_flat, dtype=np.float64).reshape(rank, rank)
            b = np.array(bb, dtype=np.float64)
        else:
            n, a, b = 0, np.zeros((rank, rank)), np.zeros(rank)
        for pdf in pdfs:
            # fix accumulation order so replays are bit-identical; drop
            # items the frozen V has no factor for (catalog grew since
            # the offline train) instead of crashing the stream — they
            # contribute at the next retrain
            pdf = pdf[pdf["item"].astype("int64").isin(item_index)]
            pdf = pdf.sort_values(["item", "rating"])
            for item, rating in zip(pdf["item"], pdf["rating"]):
                vi = np.array(v_rows[item_index[int(item)]])
                a += np.outer(vi, vi)
                b += float(rating) * vi
                n += 1
        state.update((n, a.reshape(-1).tolist(), b.tolist()))
        x = np.linalg.solve(a + reg * np.eye(rank), b)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_obs": [n],
                "factors": [x.tolist()],
            }
        )

    return interactions.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Distributed multi-feature OLS via normal equations.

The scale pattern every MPP trainer of small-feature linear models uses:
the ONLY distributed work is one aggregate producing the Gram matrix
X'X (p×p) and moment vector X'y (p) — for p features that is
p(p+1)/2 + p scalars, so the exchange carries a few dozen numbers no
matter how many rows the fact table has. The p×p solve then happens on
the driver (numpy), which is correct engineering, not a shortcut: the
solve is O(p³) on a handful of values, while the moments are the O(N)
part that must distribute.

Determinism: every per-row product is IEEE (identical on any executor),
each moment accumulates through DECIMAL(38,10) (order-independent —
partitioning cannot drift the Gram matrix by a ULP), and numpy's solve
on bit-identical input is bit-identical. Two runs at any parallelism
produce the same coefficients.

``queries/stats.py::q_linreg`` is the single-feature closed form of the
same algebra (oracle-checked bit-exact vs DuckDB); ``tests/test_ml.py``
pins this module against numpy ``lstsq`` on the collected fixture and
against q_linreg for the 1-feature case.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import DEC


@dataclass(frozen=True)
class OLSModel:
    features: tuple[str, ...]
    intercept: float
    coef: tuple[float, ...]
    n: int
    r2: float

    def predict_expr(self):
        """Column expression applying the model — a zero-shuffle scoring
        map usable in any downstream query or stream."""
        e = F.lit(self.intercept)
        for name, c in zip(self.features, self.coef):
            e = e + F.col(name).cast("double") * F.lit(c)
        return e


def fit_ols(df: DataFrame, features: list[str], target: str) -> OLSModel:
    """Fit y ~ 1 + features by normal equations.

    One aggregate computes every entry of [1, X]'[1, X] and [1, X]'y
    through exact decimal sums; the (p+1)×(p+1) solve runs driver-side.
    """
    cols = [F.lit(1.0)] + [F.col(f).cast("double") for f in features]
    p = len(cols)
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(
                F.sum((cols[i] * cols[j]).cast(DEC)).cast("double").alias(f"g_{i}_{j}")
            )
    y = F.col(target).cast("double")
    for i in range(p):
        aggs.append(F.sum((cols[i] * y).cast(DEC)).cast("double").alias(f"b_{i}"))
    aggs.append(F.sum((y * y).cast(DEC)).cast("double").alias("yy"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = df.agg(*aggs).collect()[0]

    G = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    b = np.array([row[f"b_{i}"] for i in range(p)])
    theta = np.linalg.solve(G, b)

    n = row["n"]
    sy, syy = b[0], row["yy"]  # Σy = Σ(1·y)
    ss_tot = syy - sy * sy / n
    # residual SS via the normal-equation identity: y'y − θ'X'y
    ss_res = syy - float(theta @ b)
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    return OLSModel(
        features=tuple(features),
        intercept=float(theta[0]),
        coef=tuple(float(t) for t in theta[1:]),
        n=int(n),
        r2=float(r2),
    )

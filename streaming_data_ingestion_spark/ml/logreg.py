"""Distributed logistic regression by IRLS (Newton–Raphson).

Completes the trainer triad (ml/kmeans.py: iterative unsupervised;
ml/linreg.py: closed-form supervised; here: iterative supervised). Each
Newton step is ONE distributed aggregate:

- per row: p = sigmoid(xθ), w = p(1−p), residual r = y − p — all
  IEEE-deterministic column math with θ riding in as plan literals
  (the k-means assignment pattern: model state broadcasts as constants,
  never a join);
- the step's gradient X'r and Hessian X'WX reduce through DECIMAL(38,10)
  sums — p(p+1)/2 + p scalars cross the wire per step, independent of
  row count;
- the (p+1)×(p+1) solve and the convergence check are driver-side.

Determinism: decimal sums make every step's gradient/Hessian exact for
the given θ, θ' = θ + solve(H, g) is then bit-identical on any
partitioning, so the whole trajectory — and the fitted model — is
reproducible at any parallelism. Sigmoid ULP differences across *libm
builds* would change the trajectory identically for every partitioning
on a given platform (the quantity tests pin down).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import DEC


@dataclass(frozen=True)
class LogitModel:
    features: tuple[str, ...]
    intercept: float
    coef: tuple[float, ...]
    n: int
    iterations: int
    log_likelihood: float

    def score_expr(self) -> Column:
        """P(y=1 | x) as a zero-shuffle column expression."""
        z = F.lit(self.intercept)
        for name, c in zip(self.features, self.coef):
            z = z + F.col(name).cast("double") * F.lit(c)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def fit_logistic(
    df: DataFrame,
    features: list[str],
    label: str,
    max_iter: int = 25,
    tol: float = 1e-10,
) -> LogitModel:
    """Fit P(label=1) ~ sigmoid(1·θ₀ + x·θ) by Newton–Raphson.

    ``label`` must be a 0/1 column. One aggregate per iteration; stops
    when the max |Δθ| drops under ``tol`` (quadratic convergence — takes
    ~6-8 steps on separated-ish data).
    """
    xs = [F.lit(1.0)] + [F.col(f).cast("double") for f in features]
    p = len(xs)
    y = F.col(label).cast("double")

    # A single-class label makes the MLE diverge (θ → ±inf, H → singular):
    # fail fast with a clear error instead of iterating toward overflow.
    head = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y.cast(DEC)).cast("double").alias("pos"),
        F.min(y).alias("y_min"),
        F.max(y).alias("y_max"),
    ).collect()[0]
    if not head["n"]:
        raise ValueError("fit_logistic: empty input")
    if head["y_min"] not in (0.0, 1.0) or head["y_max"] not in (0.0, 1.0):
        raise ValueError(
            f"fit_logistic: label {label!r} must be 0/1, saw "
            f"[{head['y_min']}, {head['y_max']}]"
        )
    if head["pos"] in (0.0, float(head["n"])):
        raise ValueError(
            f"fit_logistic: label {label!r} has a single class "
            f"({int(head['pos'])}/{head['n']} positive) — the logistic MLE "
            "is degenerate"
        )

    theta = np.zeros(p)

    def _z(th: np.ndarray) -> Column:
        z = F.lit(float(th[0])) * xs[0]
        for k in range(1, p):
            z = z + F.lit(float(th[k])) * xs[k]
        return z

    def _softplus(z: Column) -> Column:
        # ln(1+e^z) overflows to inf for z ≳ 709, and CAST(inf AS DECIMAL)
        # is silently NULL (= dropped from the sum); the stable form
        # max(z,0) + log1p(e^{−|z|}) never overflows.
        return F.greatest(z, F.lit(0.0)) + F.log1p(F.exp(-F.abs(z)))

    it = 0
    for it in range(1, max_iter + 1):
        z = _z(theta)
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = prob * (F.lit(1.0) - prob)
        r = y - prob

        aggs = []
        for i in range(p):
            aggs.append(F.sum((xs[i] * r).cast(DEC)).cast("double").alias(f"g_{i}"))
        for i in range(p):
            for j in range(i, p):
                aggs.append(
                    F.sum((xs[i] * xs[j] * w).cast(DEC))
                    .cast("double")
                    .alias(f"h_{i}_{j}")
                )
        aggs.append(F.count(F.lit(1)).alias("n"))
        row = df.agg(*aggs).collect()[0]

        g = np.array([row[f"g_{i}"] for i in range(p)])
        H = np.zeros((p, p))
        for i in range(p):
            for j in range(i, p):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"]
        # Collinear features (e.g. a constant column duplicating the
        # intercept) or near-separation make H singular; the minimum-norm
        # least-squares step keeps the iteration well-defined where the
        # plain solve would raise or blow up.
        try:
            step = np.linalg.solve(H, g)
            if not np.all(np.isfinite(step)):
                raise np.linalg.LinAlgError("non-finite Newton step")
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(H, g, rcond=None)[0]
        theta = theta + step
        if np.max(np.abs(step)) < tol:
            break

    # ll = Σ [y·z − softplus(z)] — evaluated at the FINAL θ (computing it
    # inside the loop would report the pre-step model's likelihood).
    zf = _z(theta)
    final = df.agg(
        F.sum((y * zf - _softplus(zf)).cast(DEC)).cast("double").alias("ll"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]

    return LogitModel(
        features=tuple(features),
        intercept=float(theta[0]),
        coef=tuple(float(t) for t in theta[1:]),
        n=int(final["n"]),
        iterations=it,
        log_likelihood=float(final["ll"]),
    )

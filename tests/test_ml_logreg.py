"""IRLS logistic regression: convergence, gradient-zero optimality, and
agreement with a driver-side numpy Newton on the identical data."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.ml.logreg import fit_logistic
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


def _numpy_newton(X, y, iters=50, tol=1e-10):
    theta = np.zeros(X.shape[1])
    for _ in range(iters):
        z = X @ theta
        p = 1.0 / (1.0 + np.exp(-z))
        w = p * (1.0 - p)
        g = X.T @ (y - p)
        H = (X * w[:, None]).T @ X
        step = np.linalg.solve(H, g)
        theta += step
        if np.max(np.abs(step)) < tol:
            break
    return theta


def test_logistic_matches_numpy_newton(spark):
    ev = (
        load(spark, SF_DIR, "events")
        .select(
            "value",
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .where(F.col("event_type").isin("purchase", "click"))
    )
    model = fit_logistic(ev, ["value"], "y")
    pdf = ev.toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf["value"].astype(float)])
    y = pdf["y"].astype(float).to_numpy()
    want = _numpy_newton(X, y)
    got = np.array([model.intercept, *model.coef])
    assert np.allclose(got, want, rtol=1e-6, atol=1e-8), (got, want)
    assert model.iterations < 25  # quadratic convergence, not the cap
    assert model.n == len(pdf)

    # optimality: the gradient at the fitted theta is ~0
    z = X @ got
    p = 1.0 / (1.0 + np.exp(-z))
    grad = X.T @ (y - p)
    assert np.max(np.abs(grad)) < 1e-6

    # distributed scoring equals the sigmoid of the linear predictor
    scored = ev.withColumn("p", model.score_expr()).toPandas()["p"].to_numpy()
    assert np.allclose(scored, p, rtol=1e-9)


def test_logistic_separates_constructed_labels(spark):
    """On a label DEFINED by a threshold on the feature, the model must
    order probabilities with the feature (monotone scoring sanity)."""
    ev = load(spark, SF_DIR, "events").select(
        "value", (F.col("value") > 50.0).cast("int").alias("y")
    )
    model = fit_logistic(ev, ["value"], "y")
    assert model.coef[0] > 0  # higher value => higher P(y=1)
    lo, hi = (
        ev.where(F.col("value") < 10).agg(F.avg(model.score_expr())).first()[0],
        ev.where(F.col("value") > 90).agg(F.avg(model.score_expr())).first()[0],
    )
    assert lo < 0.5 < hi


def test_logistic_rejects_single_class_label(spark):
    """An all-one-class label makes the MLE degenerate (θ → ±inf): the
    fit must fail fast with a clear error, not diverge to max_iter."""
    import pytest

    ev = load(spark, SF_DIR, "events").select(
        "value", F.lit(1).alias("y")
    )
    with pytest.raises(ValueError, match="single class"):
        fit_logistic(ev, ["value"], "y")
    with pytest.raises(ValueError, match="single class"):
        fit_logistic(
            ev.withColumn("y", F.lit(0)), ["value"], "y"
        )


def test_logistic_rejects_non_binary_label(spark):
    import pytest

    ev = load(spark, SF_DIR, "events").select(
        "value", (F.col("value") % 3).cast("int").alias("y")
    )
    with pytest.raises(ValueError, match="must be 0/1"):
        fit_logistic(ev, ["value"], "y")


def test_logistic_survives_collinear_constant_feature(spark):
    """A constant feature duplicates the intercept column, making the
    Hessian exactly singular; the minimum-norm lstsq fallback must keep
    the iteration defined and still recover the same decision surface as
    the well-posed single-feature fit (the constant's effect merges into
    intercept+coef in some split, but predictions are identical)."""
    ev = (
        load(spark, SF_DIR, "events")
        .select(
            "value",
            F.lit(1.0).alias("ones"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .where(F.col("event_type").isin("purchase", "click"))
    )
    model = fit_logistic(ev, ["value", "ones"], "y")
    base = fit_logistic(ev, ["value"], "y")
    # the value coefficient is identified even though intercept/ones are
    # not individually; their SUM is the effective intercept
    assert np.isfinite(model.intercept) and all(
        np.isfinite(c) for c in model.coef
    )
    assert np.allclose(model.coef[0], base.coef[0], rtol=1e-6)
    assert np.allclose(
        model.intercept + model.coef[1], base.intercept, rtol=1e-6
    )

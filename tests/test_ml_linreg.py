"""Normal-equations OLS trainer: pinned against numpy lstsq on the
collected fixture and against the oracle-checked single-feature q_linreg."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.ml.linreg import fit_ols
from streaming_data_ingestion_spark.registry import all_queries
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


def test_ols_matches_numpy_lstsq(spark):
    li = load(spark, SF_DIR, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice"
    )
    model = fit_ols(
        li, ["l_quantity", "l_discount", "l_tax"], "l_extendedprice"
    )
    pdf = li.toPandas()
    X = np.column_stack(
        [
            np.ones(len(pdf)),
            pdf["l_quantity"].astype(float),
            pdf["l_discount"].astype(float),
            pdf["l_tax"].astype(float),
        ]
    )
    y = pdf["l_extendedprice"].astype(float).to_numpy()
    theta, *_ = np.linalg.lstsq(X, y, rcond=None)
    got = np.array([model.intercept, *model.coef])
    assert np.allclose(got, theta, rtol=1e-6), (got, theta)
    assert model.n == len(pdf)
    assert 0.0 <= model.r2 <= 1.0

    # scoring expression: distributed predictions equal the numpy ones
    pred = li.withColumn("p", model.predict_expr()).toPandas()["p"].to_numpy()
    assert np.allclose(pred, X @ got, rtol=1e-9)


def test_ols_single_feature_matches_q_linreg(spark):
    """The multi-feature trainer restricted to one feature must agree with
    the oracle-checked closed-form q_linreg, per group pooled: fit on the
    whole fact (q_linreg fits per returnflag, so compare on one flag)."""
    li = load(spark, SF_DIR, "lineitem").filter(F.col("l_returnflag") == "N")
    model = fit_ols(li, ["l_quantity"], "l_extendedprice")
    row = [
        r
        for r in all_queries()["q_linreg"].fn(spark, SF_DIR).collect()
        if r["l_returnflag"] == "N"
    ][0]
    assert abs(model.coef[0] - row["slope"]) < 1e-9 * max(1, abs(row["slope"]))
    assert abs(model.intercept - row["intercept"]) < 1e-9 * max(
        1, abs(row["intercept"])
    )
    assert abs(model.r2 - row["r2"]) < 1e-9

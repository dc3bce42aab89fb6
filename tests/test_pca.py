"""Distributed PCA: covariance agreement with numpy, orthonormal
components, projection equality, and deterministic sign convention."""

from __future__ import annotations

import numpy as np

from streaming_data_ingestion_spark.ml.pca import fit_pca
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR

K = 3


def _xy(spark):
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    pdf = emb.toPandas().sort_values("vec_id")
    x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return emb, pdf, x


def test_pca_matches_numpy_eigh(spark):
    emb, pdf, x = _xy(spark)
    model = fit_pca(emb, k=K)
    assert model.n == len(x)

    c = np.cov(x, rowvar=False, ddof=0)
    evals = np.sort(np.linalg.eigvalsh(c))[::-1]
    # explained variance = the top-k eigenvalues of the population cov
    assert np.allclose(model.explained_variance, evals[:K], rtol=1e-8)
    assert np.allclose(model.mean, x.mean(axis=0), rtol=0, atol=1e-10)

    # components are orthonormal rows spanning the top-k eigenspace
    v = np.array(model.components)
    assert np.allclose(v @ v.T, np.eye(K), atol=1e-10)
    # each component is an eigenvector: Cv = λv
    for kidx in range(K):
        lhs = c @ v[kidx]
        rhs = model.explained_variance[kidx] * v[kidx]
        assert np.allclose(lhs, rhs, atol=1e-8)

    # deterministic sign convention: largest-|entry| coordinate positive
    for comp in model.components:
        arr = np.array(comp)
        assert arr[int(np.argmax(np.abs(arr)))] > 0


def test_pca_projection_matches_numpy(spark):
    emb, pdf, x = _xy(spark)
    model = fit_pca(emb, k=K)
    got = (
        model.transform(emb)
        .toPandas()
        .sort_values("vec_id")[[f"pc{i + 1}" for i in range(K)]]
        .to_numpy()
    )
    v = np.array(model.components)
    want = (x - x.mean(axis=0)) @ v.T
    assert np.allclose(got, want, atol=1e-8)
    # the sample variance of pc_k is the k-th eigenvalue
    assert np.allclose(
        got.var(axis=0, ddof=0), model.explained_variance, rtol=1e-6
    )


def test_pca_refit_is_deterministic(spark):
    emb, _, _ = _xy(spark)
    m1 = fit_pca(emb.repartition(7), k=2)
    m2 = fit_pca(emb.repartition(3), k=2)
    assert m1.components == m2.components
    assert m1.explained_variance == m2.explained_variance
    assert m1.mean == m2.mean


def test_pca_fails_fast_on_empty_input(spark):
    """fit_pca on an empty frame must raise a clear ValueError, not an
    IndexError from indexing an empty collect."""
    import pytest as _pytest

    from pyspark.sql import types as T

    from streaming_data_ingestion_spark.ml.pca import fit_pca

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField("embedding", T.ArrayType(T.FloatType()))]
        ),
    )
    with _pytest.raises(ValueError, match="no rows"):
        fit_pca(empty, k=2)


def test_pca2_closed_form_matches_numpy_trainer(spark):
    """q_pca2_project's closed-form eigenpair must agree with the
    general-d trainer (ml/pca.py, numpy eigh) restricted to the same two
    dimensions: same explained-variance share and the same |projection|
    per vector (sign conventions already aligned; tolerance covers the
    quantization step and eigh's iterative solve)."""
    import numpy as np

    from streaming_data_ingestion_spark.ml.pca import fit_pca
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load
    from tests.conftest import SF_DIR

    from pyspark.sql import functions as F

    got = {
        r["vec_id"]: r
        for r in all_queries()["q_pca2_project"].fn(spark, SF_DIR).collect()
    }

    two_d = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.slice("embedding", 1, 2).alias("embedding")
    )
    model = fit_pca(two_d, k=2)
    tot = sum(model.explained_variance)
    share = model.explained_variance[0] / tot
    any_row = next(iter(got.values()))
    assert abs(any_row["var_share_pc1"] - share) < 1e-6

    scored = {
        r["vec_id"]: r["pc1"] for r in model.transform(two_d).collect()
    }
    for vid, row in list(got.items())[:100]:
        assert np.isclose(row["pc1"], scored[vid], atol=1e-6), vid

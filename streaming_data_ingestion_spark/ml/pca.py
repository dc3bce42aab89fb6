"""Distributed PCA: exact-moment covariance → driver eigensolve →
zero-shuffle projection.

Completes the classical-ML set (kmeans: unsupervised partitioning;
linreg/logreg: supervised; here: spectral structure). The shape mirrors
the other trainers:

- **one distributed pass** accumulates the d(d+1)/2 second moments and d
  means through DECIMAL sums (posexplode + vec_id-keyed self equi-join,
  map-side partial aggregation — the same plan as the oracle-checked
  q_emb_covariance in queries/stats.py, which is this trainer's
  cross-engine-verified twin);
- the **d×d eigensolve is driver-side numpy** (`eigh` on a symmetric
  matrix — 64×64 here; even d=4096 is a sub-second driver op, never
  worth distributing);
- the fitted model **projects as column expressions** (centered dot with
  each component riding in as plan literals) — scoring a 100 TB corpus
  is a narrow map, no shuffle, no UDF.

Determinism: decimal moments are partition-order-independent, numpy's
eigh is deterministic for a given matrix, and each component's sign is
normalized (largest-|entry| coordinate made positive), so the fitted
model is reproducible at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import DEC, dlit_array


@dataclass(frozen=True)
class PCAModel:
    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]  # k rows, each length d, unit norm
    explained_variance: tuple[float, ...]  # descending eigenvalues
    n: int

    def project_exprs(self, col: str = "embedding") -> list[Column]:
        """One output column per component: (x − mean)·vₖ as a
        zero-shuffle array fold (model state as plan literals — the
        kmeans/logreg scoring pattern)."""
        mean_arr = dlit_array(self.mean)
        centered = F.zip_with(
            F.col(col), mean_arr, lambda x, m: x.cast("double") - m
        )
        outs = []
        for kidx, comp in enumerate(self.components):
            v = dlit_array(comp)
            dot = F.aggregate(
                F.zip_with(centered, v, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            outs.append(dot.alias(f"pc{kidx + 1}"))
        return outs

    def transform(self, df: DataFrame, col: str = "embedding") -> DataFrame:
        keep = [c for c in df.columns if c != col]
        return df.select(*keep, *self.project_exprs(col))


def fit_pca(df: DataFrame, k: int, col: str = "embedding") -> PCAModel:
    """Fit a k-component PCA of an array<float> column.

    One distributed moment pass (collect size: d(d+1)/2 + d scalars,
    independent of row count), then the d×d symmetric eigensolve on the
    driver.
    """
    # moments keyed by (i, j): pair the exploded positions per row via a
    # synthetic row id. The id MUST be assigned before the explode (its
    # own projection): in the same select as posexplode it would be
    # re-evaluated per exploded row, giving every (row, dim) a distinct
    # id and silently killing all off-diagonal pairs.
    # persist() before the self-join: monotonically_increasing_id is
    # NONdeterministic, and without materialization the two join subtrees
    # would each recompute it from their own scan — any divergence in
    # partition layout (AQE re-plan, task retry, nondeterministic
    # upstream) would misalign the ids and silently zero the off-diagonal
    # moments. ranking.with_global_rank persists for the same reason.
    based = df.select(
        F.monotonically_increasing_id().alias("_rid"), F.col(col).alias("_v")
    ).persist()
    try:
        with_id = based.select(
            "_rid", F.posexplode("_v").alias("i", "x")
        ).select("_rid", "i", F.col("x").cast("double").alias("xi"))
        a, b = with_id.alias("a"), with_id.alias("b")
        mom_rows = (
            a.join(
                b,
                (F.col("a._rid") == F.col("b._rid"))
                & (F.col("b.i") >= F.col("a.i")),
            )
            .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
            .agg(
                F.sum((F.col("a.xi") * F.col("b.xi")).cast(DEC))
                .cast("double")
                .alias("sxx"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        mean_rows = (
            with_id.groupBy("i")
            .agg(F.sum(F.col("xi").cast(DEC)).cast("double").alias("s"))
            .collect()
        )
    finally:
        based.unpersist()
    if not mom_rows or not mean_rows:
        raise ValueError("fit_pca: input has no rows (or empty vectors)")
    d = len(mean_rows)
    n = int(mom_rows[0]["n"])
    s = np.zeros(d)
    for r in mean_rows:
        s[r["i"]] = r["s"]
    m = s / n
    c = np.zeros((d, d))
    for r in mom_rows:
        i, j = r["i"], r["j"]
        c[i, j] = c[j, i] = r["sxx"] / n - m[i] * m[j]
    evals, evecs = np.linalg.eigh(c)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    variances = []
    for idx in order:
        v = evecs[:, idx]
        # deterministic sign: the largest-|entry| coordinate is positive
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(tuple(float(x) for x in v))
        variances.append(float(evals[idx]))
    return PCAModel(
        mean=tuple(float(x) for x in m),
        components=tuple(comps),
        explained_variance=tuple(variances),
        n=n,
    )

"""Round-10 properties: the banded-LSH embedding near-dup path.

q_emb_neardup_lsh is the bounded-candidate production path for the
near-dup problem q_emb_neardup solves with fixture label cells (whose
sf1 decade-step measured 124.8x growth — docs/BENCH_NOTES.md). These
tests pin the algorithm against an independent numpy replay and the
boundedness claim against the operator's own parameterization.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.queries.llm_similarity import (
    _NDL_BANDS,
    _NDL_ROWS,
    _NDL_THRESHOLD,
    emb_neardup_lsh,
)

from .conftest import SF_DIR

SF_TINY = "/root/testdata/sf0.001"


def _numpy_replay(sf_dir: str, rows: int, bands: int, threshold: float):
    """Independent replay: same md5-parity planes, numpy float64 math.

    np.dot's summation order differs from the engines' sequential fold,
    so sign/threshold decisions could in principle diverge on a value
    sitting exactly at a boundary — the fixtures have no such value
    (asserted by the margin check below), which is what makes this
    replay a valid oracle for set-level equality.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n, dim = V.shape
    planes = np.stack(
        [
            np.array(
                [
                    1.0
                    if int(
                        hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16
                    )
                    >= 8
                    else -1.0
                    for i in range(1, dim + 1)
                ]
            )
            for j in range(rows * bands)
        ]
    )
    dots = V @ planes.T  # n x rows*bands
    # no dot within 1e-9 of the sign boundary → fold-order differences
    # between numpy and the engines cannot flip a bit
    assert np.abs(dots).min() > 1e-9
    signs = dots >= 0
    cand = set()
    for b in range(bands):
        band = signs[:, b * rows : (b + 1) * rows]
        buckets: dict[bytes, list[int]] = {}
        for i in range(n):
            buckets.setdefault(band[i].tobytes(), []).append(i)
        for grp in buckets.values():
            for x in range(len(grp)):
                for y in range(x + 1, len(grp)):
                    a_, b_ = grp[x], grp[y]
                    if ids[a_] > ids[b_]:
                        a_, b_ = b_, a_
                    cand.add((int(ids[a_]), int(ids[b_])))
    norms = np.linalg.norm(V, axis=1)
    idx = {int(v): k for k, v in enumerate(ids)}
    out = set()
    for a_, b_ in cand:
        c = V[idx[a_]] @ V[idx[b_]] / (norms[idx[a_]] * norms[idx[b_]])
        assert abs(c - threshold) > 1e-9  # no boundary-sitting cosine
        if c >= threshold:
            out.add((a_, b_))
    return cand, out


def test_lsh_neardup_matches_numpy_replay(spark):
    """Registered binding == independent numpy replay of plane signs,
    band bucketing, candidate union, and the cosine verify — on two sf."""
    for sf in (SF_TINY, SF_DIR):
        _, want = _numpy_replay(sf, _NDL_ROWS, _NDL_BANDS, _NDL_THRESHOLD)
        got = {
            (r.vec_a, r.vec_b)
            for r in emb_neardup_lsh(spark, sf).collect()
        }
        assert got == want, f"{sf}: {got ^ want}"
        assert len(want) > 0  # the key is not vacuously green


def test_lsh_neardup_is_subset_of_brute_force_pairs(spark):
    """Every emitted pair really has cosine >= threshold (the LSH stage
    may only LOSE pairs, never invent or mis-score one)."""
    rows = emb_neardup_lsh(spark, SF_TINY).collect()
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_TINY}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    idx = {int(v): k for k, v in enumerate(ids)}
    norms = np.linalg.norm(V, axis=1)
    for r in rows:
        a, b = idx[r.vec_a], idx[r.vec_b]
        c = V[a] @ V[b] / (norms[a] * norms[b])
        assert r.vec_a < r.vec_b
        assert c >= _NDL_THRESHOLD - 1e-9
        assert abs(r.cosine - c) < 1e-9


def test_lsh_band_width_bounds_candidates(spark):
    """The production-policy lever: widening the band (more sign bits)
    strictly shrinks the candidate population on the real fixture —
    rows_per_band ~ log2(n) is what holds sum(n_bucket^2) ~ O(n) as the
    corpus grows. The OPERATOR is executed at each width (threshold -2
    keeps every scored pair, so the count IS the candidate population)
    and must match the numpy replay exactly — a width-handling bug that
    cancels at the default 10 bits (plane indexing, 2^i weighting past
    bit 9, band arithmetic) cannot hide."""
    counts = {}
    for r in (6, 10, 14):
        cand, _ = _numpy_replay(SF_DIR, r, _NDL_BANDS, _NDL_THRESHOLD)
        got = {
            (row.vec_a, row.vec_b)
            for row in emb_neardup_lsh(
                spark, SF_DIR, rows_per_band=r, threshold=-2.0
            ).collect()
        }
        assert got == cand, f"r={r}: {len(got ^ cand)} pair diffs"
        counts[r] = len(cand)
    assert counts[6] > counts[10] > counts[14]
    assert counts[14] < counts[6] / 10  # an actual collapse, not jitter


def test_lsh_nondefault_width_survivors_match_replay(spark):
    """Full pipeline (bucket + verify) at NON-default parameters: the
    surviving pairs at rows_per_band=6 (4 bands) and at the registered
    b2 shape (6 bits x 2 bands @ 0.40) on the tiny fixture equal the
    replay's — the parameterization the scale policy depends on is
    oracle-checked end to end, not only at the default binding."""
    from streaming_data_ingestion_spark.queries.llm_similarity import (
        _NDL_B2_BANDS,
        _NDL_B2_ROWS,
        _NDL_B2_THRESHOLD,
    )

    for rows, bands, th in (
        (6, _NDL_BANDS, _NDL_THRESHOLD),
        (_NDL_B2_ROWS, _NDL_B2_BANDS, _NDL_B2_THRESHOLD),
    ):
        _, want = _numpy_replay(SF_TINY, rows, bands, th)
        got = {
            (r.vec_a, r.vec_b)
            for r in emb_neardup_lsh(
                spark, SF_TINY, rows_per_band=rows, bands=bands,
                threshold=th,
            ).collect()
        }
        assert got == want and len(want) > 0, (rows, bands, th)


def test_lsh_neardup_plan_shape(spark):
    """The candidate self-join must key on (band, bucket) and the wide
    embedding arrays must NOT ride through it: only the id-pair distinct
    feeds the verify joins."""
    df = emb_neardup_lsh(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # posexplode of the band buckets
    # the distinct on (vec_a, vec_b) exists as an aggregate over the ids
    assert "vec_a" in plan and "vec_b" in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # band+bucket are the equi-join keys of the candidate stage
    assert "band" in opt and "bucket" in opt

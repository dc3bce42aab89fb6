"""ALS trainer: numpy-reference equivalence + objective descent.

Same discipline as test_kmeans/test_pca: the distributed trainer is
pinned against an offline numpy replica running the IDENTICAL algorithm
from the IDENTICAL deterministic init — the only divergence allowed is
float-sum ordering in the item-moment exchange (≤ 1e-6 here).
"""

from __future__ import annotations

import numpy as np
import pytest

from streaming_data_ingestion_spark.ml.als import (
    als_fit,
    init_item_factors,
    interactions_from_events,
)
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR

RANK, ITERS, REG = 4, 3, 0.1


@pytest.fixture(scope="module")
def inter_rows(spark):
    inter = interactions_from_events(load(spark, SF_DIR, "events"))
    return [(r["user_id"], r["item"], r["rating"]) for r in inter.collect()]


def _numpy_als(rows, rank, n_iters, reg):
    users = sorted({u for u, _, _ in rows})
    items = sorted({i for _, i, _ in rows})
    uix = {u: p for p, u in enumerate(users)}
    iix = {i: p for p, i in enumerate(items)}
    v = init_item_factors(items, rank)
    u_mat = np.zeros((len(users), rank))
    by_user: dict[int, list] = {}
    by_item: dict[int, list] = {}
    for u, i, r in rows:
        by_user.setdefault(u, []).append((i, r))
        by_item.setdefault(i, []).append((u, r))
    history = []
    for _ in range(n_iters):
        for u, pairs in by_user.items():
            pairs = sorted(pairs)
            vi = v[[iix[i] for i, _ in pairs]]
            r_vec = np.array([r for _, r in pairs])
            u_mat[uix[u]] = np.linalg.solve(
                vi.T @ vi + reg * np.eye(rank), vi.T @ r_vec
            )
        for i, pairs in by_item.items():
            xu = u_mat[[uix[u] for u, _ in pairs]]
            r_vec = np.array([r for _, r in pairs])
            v[iix[i]] = np.linalg.solve(
                xu.T @ xu + reg * np.eye(rank), xu.T @ r_vec
            )
        se = sum(
            (r - u_mat[uix[u]] @ v[iix[i]]) ** 2 for u, i, r in rows
        )
        history.append(float(np.sqrt(se / len(rows))))
    return u_mat, v, uix, history


def test_als_matches_numpy_reference(spark, inter_rows):
    inter = interactions_from_events(load(spark, SF_DIR, "events"))
    users_df, v, item_ids, hist = als_fit(
        inter, rank=RANK, n_iters=ITERS, reg=REG
    )
    u_ref, v_ref, uix, hist_ref = _numpy_als(inter_rows, RANK, ITERS, REG)

    assert np.allclose(v, v_ref, atol=1e-6), "item factors diverged"
    got_u = {r["user_id"]: r["factors"] for r in users_df.collect()}
    assert set(got_u) == set(uix)
    for u, pos in uix.items():
        assert np.allclose(got_u[u], u_ref[pos], atol=1e-6)
    assert np.allclose(hist, hist_ref, atol=1e-6)


def test_als_objective_descends_and_beats_mean(spark, inter_rows):
    inter = interactions_from_events(load(spark, SF_DIR, "events"))
    _, _, _, hist = als_fit(inter, rank=RANK, n_iters=ITERS, reg=REG)
    # alternating ridge solves never increase the (unregularized-eval)
    # objective in practice on this fixture; assert monotone descent
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
    # and the factorization explains more than the global mean predictor
    ratings = np.array([r for _, _, r in inter_rows])
    baseline = float(np.sqrt(((ratings - ratings.mean()) ** 2).mean()))
    assert hist[-1] < baseline


def test_interactions_shape(spark):
    inter = interactions_from_events(load(spark, SF_DIR, "events"))
    rows = inter.collect()
    assert rows and all(r["rating"] > 0 for r in rows)
    # one row per (user, item): the builder aggregates duplicates
    keys = [(r["user_id"], r["item"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_recommend_topk_matches_numpy_and_excludes_seen(spark, inter_rows):
    from streaming_data_ingestion_spark.ml.als import recommend_topk

    inter = interactions_from_events(load(spark, SF_DIR, "events"))
    users_df, v, item_ids, _ = als_fit(inter, rank=RANK, n_iters=2, reg=REG)
    recs = recommend_topk(users_df, v, item_ids, k=5, seen=inter).collect()

    by_user: dict[int, list] = {}
    for r in recs:
        by_user.setdefault(r["user_id"], []).append(r)
    seen = {}
    for u, i, _ in inter_rows:
        seen.setdefault(u, set()).add(i)
    got_u = {r["user_id"]: np.array(r["factors"]) for r in users_df.collect()}
    iix = {it: pos for pos, it in enumerate(item_ids)}

    for u, rows in by_user.items():
        rows = sorted(rows, key=lambda r: r["rk"])
        assert len(rows) == 5
        # never recommends an already-seen item
        assert not {r["item"] for r in rows} & seen[u]
        # scores agree with the dense numpy ranking over unseen items
        dense = {
            it: float(got_u[u] @ v[iix[it]])
            for it in item_ids
            if it not in seen[u]
        }
        want = sorted(dense.items(), key=lambda p: (-p[1], -p[0]))[:5]
        for r, (it, sc) in zip(rows, want):
            assert abs(r["score"] - sc) < 1e-9
            assert r["score"] == pytest.approx(dense[r["item"]], abs=1e-12)
        # descending scores
        assert all(
            rows[i]["score"] >= rows[i + 1]["score"] - 1e-12
            for i in range(4)
        )


def test_streaming_foldin_equals_batch_user_step(spark, tmp_path, inter_rows):
    """Two-batch streaming fold-in must equal the batch ridge solve over
    the union: the per-user moment state makes arrival order and batch
    boundaries irrelevant (verified at 1e-9, the float-sum envelope)."""
    from streaming_data_ingestion_spark.ml.als import init_item_factors
    from streaming_data_ingestion_spark.streaming.als_stream import (
        streaming_user_factors,
    )

    rows = sorted(inter_rows)
    item_ids = sorted({i for _, i, _ in rows})
    v = init_item_factors(item_ids, RANK)

    src = tmp_path / "inter_src"
    src.mkdir()
    half = len(rows) // 2
    schema = "user_id long, item int, rating double"
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    # stream reads the directory of parquet parts
    import shutil

    for p in (src / "b0").glob("*.parquet"):
        shutil.move(str(p), str(src / "part0.parquet"))
    shutil.rmtree(str(src / "b0"))
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    for p in (src / "b1").glob("*.parquet"):
        shutil.move(str(p), str(src / "part1.parquet"))
    shutil.rmtree(str(src / "b1"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    name = "als_foldin"
    q = (
        streaming_user_factors(stream, v, item_ids, reg=REG)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emission per user (max n_obs) is the folded-in result
    got = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        prev = got.get(r["user_id"])
        if prev is None or r["n_obs"] > prev[0]:
            got[r["user_id"]] = (r["n_obs"], r["factors"])

    iix = {it: pos for pos, it in enumerate(item_ids)}
    by_user: dict[int, list] = {}
    for u, i, rt in rows:
        by_user.setdefault(u, []).append((i, rt))
    assert set(got) == set(by_user)
    for u, pairs in by_user.items():
        vi = v[[iix[i] for i, _ in pairs]]
        r_vec = np.array([rt for _, rt in pairs])
        want = np.linalg.solve(
            vi.T @ vi + REG * np.eye(RANK), vi.T @ r_vec
        )
        n_obs, factors = got[u]
        assert n_obs == len(pairs)
        assert np.allclose(factors, want, atol=1e-9)


def test_streamed_factors_serve_same_recommendations(spark, tmp_path, inter_rows):
    """Serving loop closure: recommendations computed from the
    STREAM-folded user factors equal those from the equivalent batch
    solve — the online refresh path and the offline path hand the
    recommender interchangeable inputs."""
    from streaming_data_ingestion_spark.ml.als import (
        init_item_factors,
        recommend_topk,
    )
    from streaming_data_ingestion_spark.streaming.als_stream import (
        streaming_user_factors,
    )

    rows = sorted(inter_rows)[:300]
    item_ids = sorted({i for _, i, _ in rows})
    v = init_item_factors(item_ids, RANK)
    schema = "user_id long, item int, rating double"

    src = tmp_path / "serve_src"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.json(
        str(tmp_path / "tmpjson")
    )
    import shutil

    for i, p in enumerate(
        sorted((tmp_path / "tmpjson").glob("*.json"))
    ):
        shutil.move(str(p), str(src / f"part{i}.json"))

    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        streaming_user_factors(stream, v, item_ids, reg=REG)
        .writeStream.format("memory")
        .queryName("serve_factors")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.sql(
        """SELECT user_id, max_by(factors, n_obs) AS factors
           FROM serve_factors GROUP BY user_id"""
    )
    iix = {it: pos for pos, it in enumerate(item_ids)}
    by_user: dict[int, list] = {}
    for u, i, rt in rows:
        by_user.setdefault(u, []).append((i, rt))
    batch_rows = []
    for u, pairs in by_user.items():
        vi = v[[iix[i] for i, _ in pairs]]
        r_vec = np.array([rt for _, rt in pairs])
        x = np.linalg.solve(vi.T @ vi + REG * np.eye(RANK), vi.T @ r_vec)
        batch_rows.append((u, x.tolist()))
    batch = spark.createDataFrame(
        batch_rows, "user_id long, factors array<double>"
    )

    recs_s = recommend_topk(streamed, v, item_ids, k=3).collect()
    recs_b = recommend_topk(batch, v, item_ids, k=3).collect()
    key = lambda r: (r["user_id"], r["rk"])  # noqa: E731
    s_map = {key(r): r["item"] for r in recs_s}
    b_map = {key(r): r["item"] for r in recs_b}
    assert s_map == b_map

"""Distributed alternating least squares (explicit-feedback matrix
factorization) over a (user, item, rating) interaction frame.

The collaborative-filtering trainer a curation/recommendation pipeline
runs next to the content models (ml/kmeans, ml/pca): factorize the
interaction matrix R ≈ U Vᵀ, rank r, ridge λ.

Scale shape per half-iteration — deliberately ASYMMETRIC, because the
two sides have different cardinalities at 100 TB:

- **User step** (users: billions, partitioned): the item-factor matrix
  V (items × r) is broadcast into a grouped ``applyInPandas`` — each
  user's ridge normal equations (A_u = Σ v_i v_iᵀ + λI, b_u = Σ r_ui
  v_i) solve inside its Arrow batch. ONE user-keyed shuffle; no
  user-side state ever leaves its partition. Valid while items × r
  floats fit the broadcast budget (~10⁷ items × 8 at 8 B ≈ 640 MB —
  beyond that the item catalog must shard and this step becomes the
  blocked variant below).
- **Item step** (items: bounded): U is user-count-sized and must NOT
  broadcast. Instead the per-item normal-equation MOMENTS are computed
  distributed — interactions join the user-factor table on user_id
  (equi shuffle), the r×r outer products partial-aggregate map-side to
  (item, j, k) — and only the assembled (items × r²) moment rows reach
  the driver, where the r×r solves are microseconds each. Driver
  state: items × (r² + r) floats, the same bounded-fixpoint budget as
  kmeans' centroids.

Determinism: V's init is a pure integer hash of (item, dim) — no RNG —
and each user group sorts its items before accumulating, so the only
nondeterminism is float-sum ordering in the item-moment exchange
(≤ 1e-12 relative); tests pin against a same-init numpy reference at
1e-6.

Reference parity note: the reference repo (nikhilgy/
streaming-data-ingestion) has no ML surface; this module is part of
the §2B north-star training-pipeline breadth, like ml/kmeans.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import dlit_array, dlit_matrix, llit_array


def interactions_from_events(events: DataFrame) -> DataFrame:
    """(user_id, item, rating): item = the ``k`` prop, rating = ln(1+n)
    of the user's interactions with it — the classic implicit-count
    damping, computed with one hash aggregate."""
    return (
        events.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .groupBy("user_id", "item")
        .agg(F.log1p(F.count(F.lit(1))).alias("rating"))
    )


def init_item_factors(items: list[int], rank: int) -> np.ndarray:
    """Deterministic V init: integer hash of (item, dim) → [-0.5, 0.5).
    No RNG, so two clusters (or an offline numpy replica) start
    identically."""
    items_arr = np.asarray(sorted(items), dtype=np.int64)
    # reduce mod a small prime BEFORE the Knuth multiply so every
    # intermediate stays far below 2^63: item ids above ~6e7 would
    # otherwise overflow — silently wrapping here (and in Spark's
    # non-ANSI bigint) while an ANSI engine (the DuckDB oracle of
    # q_als_user_step, which mirrors this init) raises out-of-range
    grid = (
        ((items_arr[:, None] % 1000003) * 31 + np.arange(rank)[None, :] + 1)
        * 2654435761
    ) % 1000
    return grid.astype(np.float64) / 1000.0 - 0.5


def _solve_users(
    inter: DataFrame, v: np.ndarray, item_index: dict[int, int], reg: float
) -> DataFrame:
    """User half-step: per-user ridge solve with V broadcast into the
    Arrow batches. Output one row per user: (user_id, factors)."""
    rank = v.shape[1]

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("item")  # fix accumulation order
        rows = [item_index[i] for i in pdf["item"]]
        vi = v[rows]  # (n_u, r)
        a = vi.T @ vi + reg * np.eye(rank)
        b = vi.T @ pdf["rating"].to_numpy()
        x = np.linalg.solve(a, b)
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "factors": [x.tolist()]}
        )

    return inter.groupBy("user_id").applyInPandas(
        solve, schema="user_id long, factors array<double>"
    )


def _item_moments(
    inter: DataFrame, users: DataFrame, rank: int
) -> list:
    """Item half-step moments, computed DISTRIBUTED: join factors onto
    interactions (user-keyed equi shuffle), expand the r×r outer
    product row-side, partial-aggregate to (item, j, k) sums plus the
    r-vector b terms. Returns items × r² + items × r rows — the only
    data that reaches the driver."""
    joined = inter.join(users, "user_id").select("item", "rating", "factors")
    terms = joined.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.lit(k).alias("k"),
                        (
                            F.element_at("factors", j + 1)
                            * F.element_at("factors", k + 1)
                        ).alias("aa"),
                        (
                            F.when(
                                F.lit(k == 0),
                                F.element_at("factors", j + 1)
                                * F.col("rating"),
                            ).otherwise(F.lit(0.0))
                        ).alias("bb"),
                    )
                    for j in range(rank)
                    for k in range(rank)
                ]
            )
        ).alias("t"),
    ).select("item", "t.j", "t.k", "t.aa", "t.bb")
    return (
        terms.groupBy("item", "j", "k")
        .agg(F.sum("aa").alias("a"), F.sum("bb").alias("b"))
        .collect()
    )


def als_fit(
    inter: DataFrame,
    rank: int = 4,
    n_iters: int = 4,
    reg: float = 0.1,
) -> tuple[DataFrame, np.ndarray, list[int], list[float]]:
    """Alternate user/item ridge solves; returns (user_factors_df,
    item_factor_matrix, item_ids, rmse_history). RMSE is evaluated
    after every full iteration with a row-side fold (no extra
    shuffle beyond the user-factor join)."""
    spark = inter.sparkSession
    inter = inter.persist()
    item_ids = sorted(
        r["item"] for r in inter.select("item").distinct().collect()
    )
    item_index = {it: pos for pos, it in enumerate(item_ids)}
    v = init_item_factors(item_ids, rank)

    history: list[float] = []
    users = None
    for _ in range(n_iters):
        prev = users
        users = _solve_users(inter, v, item_index, reg).persist()
        moments = _item_moments(inter, users, rank)
        if prev is not None:
            prev.unpersist()
        a = np.zeros((len(item_ids), rank, rank))
        b = np.zeros((len(item_ids), rank))
        for r in moments:
            pos = item_index[r["item"]]
            a[pos, r["j"], r["k"]] += r["a"]
            if r["k"] == 0:
                b[pos, r["j"]] += r["b"]
        for pos in range(len(item_ids)):
            v[pos] = np.linalg.solve(
                a[pos] + reg * np.eye(rank), b[pos]
            )
        history.append(_rmse(inter, users, v, item_index))
    inter.unpersist()
    return users, v, item_ids, history


def _rmse(
    inter: DataFrame,
    users: DataFrame,
    v: np.ndarray,
    item_index: dict[int, int],
) -> float:
    """Row-side prediction fold: V rides in as a literal array-of-arrays
    indexed by the item's dense position — no item join, one user join."""
    v_lit = dlit_matrix(v)
    idx_lit = F.map_from_arrays(
        llit_array(item_index),
        llit_array(item_index.values()),
    )
    pred = F.aggregate(
        F.zip_with(
            F.col("factors"),
            F.element_at(v_lit, F.element_at(idx_lit, F.col("item")) + 1),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    row = (
        inter.join(users, "user_id")
        .select(((F.col("rating") - pred) ** 2).alias("e2"))
        .agg(F.avg("e2").alias("mse"))
        .collect()[0]
    )
    return float(row["mse"]) ** 0.5


def recommend_topk(
    users: DataFrame,
    v: np.ndarray,
    item_ids: list[int],
    k: int = 5,
    seen: DataFrame | None = None,
) -> DataFrame:
    """Per-user top-k item recommendations, computed at scan speed.

    The item-factor matrix rides into the plan as a literal
    array-of-structs; each user's scores fold row-side and a single
    ``slice(array_sort(...))`` keeps the top k — no shuffle, no
    user×item join materialized. ``seen`` (user_id, item) marks
    already-interacted items to exclude (broadcast map of per-user seen
    lists when provided). Output: (user_id, item, score, rk) — k rows
    per user via one posexplode, still narrow."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("factors"),
                        dlit_array(v[pos]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("score"),
                F.lit(int(item)).alias("item"),
            )
            for pos, item in enumerate(item_ids)
        ]
    )
    if seen is not None:
        seen_lists = seen.groupBy("user_id").agg(
            F.collect_set("item").alias("_seen")
        )
        users = users.join(seen_lists, "user_id", "left")
        scored = F.filter(
            scored,
            lambda s: ~F.coalesce(
                F.array_contains(F.col("_seen"), s["item"]), F.lit(False)
            ),
        )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, k)
    out = users.select(
        "user_id", F.posexplode(top).alias("rk0", "rec")
    ).select(
        "user_id",
        F.col("rec.item").alias("item"),
        F.col("rec.score").alias("score"),
        (F.col("rk0") + 1).alias("rk"),
    )
    return out

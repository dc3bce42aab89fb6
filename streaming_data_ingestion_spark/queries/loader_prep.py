"""Training-run loader preparation (SURVEY.md §2B breadth): the last
mile between a filtered corpus and a data loader — shard assignment,
curriculum phasing, and exact token-budget selection. All three are
content-addressed / rank-exact so any engine, run, or partitioning
reproduces the identical training set.

Reference parity note: the reference (/root/reference, 292-LoC ingest
pipeline) stops at ingestion; this is §2B/north-star breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streaming_data_ingestion_spark.queries.llm_text import (
    _SQL_TOKENS,
    _tokens,
)
from streaming_data_ingestion_spark.ranking import with_global_rank
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load, spread_for_cpu

# --------------------------------------------------------------------------
# q_shard_assign — content-addressed shard assignment + balance audit.
# --------------------------------------------------------------------------

_N_SHARDS = 8


@query(
    "q_shard_assign",
    oracle=f"""
WITH d AS (
  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {_N_SHARDS} AS shard,
         CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_toks
  FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
SELECT
  CAST(shard AS INTEGER) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
  CAST(COUNT(*) * {_N_SHARDS} AS DOUBLE) / CAST(tot.n AS DOUBLE)
    AS balance
FROM d CROSS JOIN tot
GROUP BY shard, tot.n
ORDER BY shard
""",
    tags=("llm", "pipeline", "loader"),
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for data-loader workers: shard =
    md5(doc_id) mod {_N_SHARDS}, with per-shard doc/token totals and the
    balance ratio (n·shards/total — 1.0 = perfectly even; hash sharding
    concentrates to 1±O(1/√(n/shards))). Content-addressed like
    q_split_assign, so re-running the pipeline or changing partitioning
    can never reshuffle examples between workers (which would break
    epoch-boundary dedup and resume-from-step reproducibility).

    Scale shape: a row-local hash + one shards-sized aggregate + a 1-row
    total broadcast — no data-sized shuffle beyond the map-side-combined
    count.
    """
    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    sh = d.select(
        (h % _N_SHARDS).cast("int").alias("shard"),
        F.size(_tokens()).cast("long").alias("n_toks"),
    )
    tot = sh.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        sh.crossJoin(F.broadcast(tot))
        .groupBy("shard", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            (
                (F.col("n_docs") * _N_SHARDS).cast("double")
                / F.col("n").cast("double")
            ).alias("balance"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# q_curriculum_order — length-curriculum phases (short → long).
# --------------------------------------------------------------------------

_N_PHASES = 4


@query(
    "q_curriculum_order",
    oracle=f"""
WITH d AS (
  SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_toks
  FROM documents
),
ranked AS (
  SELECT n_toks,
         ROW_NUMBER() OVER (ORDER BY n_toks, doc_id) AS r,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n
  FROM d
)
SELECT
  CAST(((r - 1) * {_N_PHASES}) // n + 1 AS INTEGER) AS phase,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MIN(n_toks) AS BIGINT) AS min_tokens,
  CAST(MAX(n_toks) AS BIGINT) AS max_tokens,
  CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM ranked
GROUP BY phase
ORDER BY phase
""",
    tags=("llm", "pipeline", "loader"),
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-curriculum phase assignment (the classic short→long
    schedule): documents ranked by token count and cut into
    {_N_PHASES} equal-population phases via the closed-form NTILE
    ((r−1)·k)//n + 1 — with per-phase doc counts, token-length bounds,
    and token totals (the phase boundaries a training scheduler reads).

    Scale shape: the rank comes from ONE with_global_rank pass over
    (n_toks, doc_id) — the distributed range exchange, never an
    unpartitioned window — and n rides along from the same pass; the
    phase cut is pure integer arithmetic, so phases are bit-identical
    cross-engine.
    """
    d = spread_for_cpu(load(spark, sf_dir, "documents")).select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_toks")
    )
    ranked, n = with_global_rank(d, ["n_toks", "doc_id"], rank_col="r")
    phase = F.expr(f"((r - 1) * {_N_PHASES}) div {n} + 1").cast("int")
    return (
        ranked.select(phase.alias("phase"), "n_toks")
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_toks").cast("long").alias("min_tokens"),
            F.max("n_toks").cast("long").alias("max_tokens"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("phase")
    )


# --------------------------------------------------------------------------
# q_token_budget_pick — exact token-budget selection in hash order.
# --------------------------------------------------------------------------

_BUDGET = 20_000  # tokens

# Hex-prefix recursion depth for the distributed prefix sum: each level
# shrinks the boundary cell that still needs a per-row running sum by
# 16×, so the windowed relation is ≤ 16^-LEVELS of the corpus (at
# 100 TB, 3 levels bound it to ~1/4096 — tens of GB, one healthy task
# group, while levels 1..k-1 move only 16-row spines).
_BUDGET_LEVELS = 2


def _hex_budget_parts(
    d: DataFrame,
    budget: int,
    levels: int = _BUDGET_LEVELS,
    cache_tag: str = "",
):
    """Decompose the budget walk over ``d`` (cols: doc_id, source, h,
    n_toks) into wholesale-taken parts plus ONE final boundary sub-cell.

    Level l buckets the current boundary relation by hex digit l of the
    md5 ``h``; a 16-row total/offset spine (bounded triangle join,
    broadcast) tells which cells sit wholly inside the budget (taken
    WHOLESALE, no per-row work), wholly outside (dropped), or straddle
    it (exactly one cell — recurse). Hex-prefix order is a prefix of the
    full (h, doc_id) order, so the union of wholesale parts plus the
    resolved boundary equals a flat global running sum.

    Returns ``(parts, boundary)``: ``parts`` is a list of (source,
    n_toks) DataFrames taken wholesale; ``boundary`` is the final
    straddling sub-cell (cols: b, doc_id, source, h, n_toks, before),
    ≤ 16^-levels of the corpus, whose rows still need the per-row
    running sum seeded with its exact composed offset ``before``.

    ``cache_tag`` (non-empty ⇒ persist): each level's tagged relation
    feeds two consumers (the wholesale-part filter and the recursion
    base the next level chains from); without a persist every union
    branch re-runs all prior levels' spine-join chains. The cached
    relation is the same narrow proxy rows plus two spine columns and
    shrinks 16× per level. Empty tag (the test-harness default) keeps
    the walk fully lazy, so synthetic relations never alias a cache.
    """
    from streaming_data_ingestion_spark.caching import bounded_persist

    parts: list[DataFrame] = []
    cur = d.withColumn("before", F.lit(0).cast("long"))
    for lvl in range(1, levels + 1):
        cur = cur.withColumn("b", F.substring("h", lvl, 1))
        bt = cur.groupBy("b").agg(
            F.sum("n_toks").cast("long").alias("t"),
            # the cell's inherited offset: constant across the (single)
            # parent boundary cell, so min() just carries it through
            F.min("before").cast("long").alias("base"),
        )
        a, c = bt.alias("a"), bt.alias("c")
        offs = (
            a.join(F.broadcast(c), F.col("c.b") < F.col("a.b"), "left")
            .groupBy(
                F.col("a.b").alias("b"),
                F.col("a.t").alias("t"),
                F.col("a.base").alias("base"),
            )
            .agg(
                F.coalesce(F.sum("c.t"), F.lit(0)).cast("long").alias("prior")
            )
            .select(
                "b",
                "t",
                (F.col("base") + F.col("prior")).cast("long").alias("off"),
            )
        )
        # tagged feeds TWO consumers at this level (the wholesale-part
        # filter and the straddling-cell recursion base, which the next
        # level's whole subtree chains from) — without the persist each
        # union branch re-runs every prior level's spine join chain over
        # the proxy cache. The relation is the same NARROW proxy rows
        # (decide-with-small-rows: ~50 B/row) plus two spine columns, and
        # shrinks 16× per level.
        tagged = cur.drop("before").join(F.broadcast(offs), "b")
        if cache_tag:
            tagged = bounded_persist(
                f"q_token_budget_pick.tagged{lvl}",
                f"{cache_tag}|{budget}",
                lambda t=tagged: t,
            )
        parts.append(
            tagged.where(F.col("off") + F.col("t") <= budget).select(
                "source", "n_toks"
            )
        )
        cur = (
            tagged.where(
                (F.col("off") < budget)
                & (F.col("off") + F.col("t") > budget)
            )
            .withColumnRenamed("off", "before")
            .drop("t")
        )
    return parts, cur


@query(
    "q_token_budget_pick",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_toks
  FROM documents
),
run AS (
  SELECT source, n_toks,
         SUM(n_toks) OVER (ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d
)
SELECT
  source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM run WHERE cum <= {_BUDGET}
GROUP BY source
ORDER BY source
""",
    tags=("llm", "pipeline", "loader"),
)
def q_token_budget_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-budget selection: walk the corpus in content-hash
    order (md5(doc_id) — a deterministic, source-unbiased shuffle) and
    keep documents while the running token total stays within the
    {_BUDGET}-token budget; report the picked set per source. This is
    how a budgeted training mix takes "the first B tokens" without any
    ordering bias — and the per-source readout shows the mix the budget
    actually bought.

    Scale shape — a distributed PREFIX SUM without a global window,
    recursing {_BUDGET_LEVELS} hex digits deep (_hex_budget_parts): each
    level's 16-row total/offset spine (bounded triangle join, broadcast)
    takes whole cells inside the budget WHOLESALE, drops whole cells
    outside, and recurses into the ONE straddling cell — so the only
    per-row running sum runs over the final boundary sub-cell,
    ≤ 16^-{_BUDGET_LEVELS} of the corpus (asserted by row count in
    tests/test_round7_props.py), seeded with its exact composed offset.
    The selected set is identical to the oracle's flat running sum
    because hex-prefix order is a prefix of the full (h, doc_id) order.
    """
    from streaming_data_ingestion_spark.caching import bounded_persist

    # Materialize the NARROW proxy (doc_id, source, h, n_toks — no text)
    # exactly once: the recursion's parts/spine/boundary subtrees are
    # separate plan branches, and without the persist each one re-ran
    # the full tokenize+md5 scan of the documents table (~2·levels+2
    # corpus passes; measured 2.1s → 0.9s at sf0.1). This is the
    # decide-with-small-rows split: one pass computes the few bytes the
    # budget walk needs, every later pass touches only those bytes.
    d = bounded_persist(
        "q_token_budget_pick.d",
        sf_dir,
        lambda: load(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
            F.size(_tokens()).cast("long").alias("n_toks"),
        ),
    )
    parts, boundary = _hex_budget_parts(d, _BUDGET, cache_tag=sf_dir)
    # the final boundary sub-cell: per-row running sum over ≤ 16^-k of
    # the corpus, partitioned by its full hex prefix
    w = (
        Window.partitionBy(F.substring("h", 1, _BUDGET_LEVELS))
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = (
        boundary.withColumn(
            "cum", F.col("before") + F.sum("n_toks").over(w)
        )
        .where(F.col("cum") <= _BUDGET)
        .select("source", "n_toks")
    )
    sel = parts[0]
    for p in parts[1:]:
        sel = sel.unionByName(p)
    return (
        sel.unionByName(resolved)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .orderBy("source")
    )

"""Serving-path queries: operators whose value is a STORED artifact a
maintenance process built — read back on a registered, oracle-checked
path, the way q_zorder_scan (layout_q.py) proves the Z-order layout and
q_sim_ivfpq_index proves the partition-pruned ANN index.

Two stories land here:

* q_hist_serving — the batch serving read of the mergeable-histogram
  table streaming/hist_stream.py maintains. The builder drives the very
  merge writer the stream uses (four deterministic epoch slices PLUS a
  replayed epoch), so the driver's hash check covers the full
  maintain→store→serve loop: if merge idempotence ever broke, the
  served counts would double and the oracle (a one-shot histogram over
  the raw table in DuckDB) would mismatch.

* q_zorder_optimize_scan — a scan through a table that started life as
  streaming-sink debris (many small unclustered files) and was rewritten
  by layout.optimize_zordered (the OPTIMIZE ... ZORDER BY maintenance
  shape): compaction + multi-dimensional clustering in one pass. The
  result is layout-independent, so it hash-checks against DuckDB over
  the raw table; tests/test_layout.py asserts the physical story
  (fewer files, footer-stats skipping).

Reference parity note: the reference (292-LoC ingest pipeline,
/root/reference/spark-streaming.py) has no serving or maintenance layer
at all; this is §2B/north-star analytical surface.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streaming_data_ingestion_spark.compat import dsum, llit_array, sql_dsum
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import artifact_path, load

# --------------------------------------------------------------------------
# q_hist_serving — read the stored mergeable histogram.
# --------------------------------------------------------------------------

# Fixed grid (mergeability demands boundaries chosen up front; at 100 TB
# the metric's domain is known): [0, 512) in 256 bins of width exactly
# 2.0 — a power-of-two width, so the bin of every value is one IEEE
# subtract + divide + floor, bit-identical across engines. The fixture's
# value column tops out near 560 at sf0.1, so the overflow bin is
# genuinely exercised.
_H_LO, _H_HI, _H_BINS = 0.0, 512.0, 256

_HIST_MEMO: dict[str, str] = {}


def stored_hist_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the merged histogram table for
    ``sf_dir`` by driving streaming/hist_stream.py's merge writer over
    four deterministic epoch slices of the events table — then REPLAY
    one epoch, so the serving read exercises the idempotence protocol
    end-to-end (a broken replay skip would double bins and fail the
    driver's hash check)."""
    if sf_dir not in _HIST_MEMO:
        from streaming_data_ingestion_spark.streaming.hist_stream import (
            merge_value_hist,
        )

        tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = artifact_path(f"events_hist_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        ev = load(spark, sf_dir, "events")
        wb = merge_value_hist(
            path, "value", _H_LO, _H_HI, _H_BINS, run_ns="hist-serve"
        )
        for e in range(4):
            wb(ev.where(F.col("event_id") % 4 == e), e)
        # injected replay of the FINAL epoch (the crash-recovery shape:
        # foreachBatch only ever re-delivers the last uncommitted
        # epoch): must be a no-op on the stored table
        wb(ev.where(F.col("event_id") % 4 == 3), 3)
        _HIST_MEMO[sf_dir] = path
    return _HIST_MEMO[sf_dir]


@query(
    "q_hist_serving",
    oracle=f"""
WITH b AS (
  SELECT CASE WHEN CAST(value AS DOUBLE) < {_H_LO} THEN -1
              WHEN CAST(value AS DOUBLE) >= {_H_HI} THEN {_H_BINS}
              ELSE CAST(FLOOR((CAST(value AS DOUBLE) - {_H_LO}) / 2.0)
                        AS INTEGER) END AS bin
  FROM events
  WHERE value IS NOT NULL
)
SELECT
  CAST(bin AS INTEGER) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(COUNT(*)) OVER (ORDER BY bin
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
FROM b
GROUP BY bin
ORDER BY bin
""",
    tags=("serving", "sketch", "events"),
)
def q_hist_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution readout from the STORED mergeable histogram — the
    serving half of the streaming sketch trio (CMS = frequency, HLL =
    cardinality, histogram = distribution): per-bin count plus the
    cumulative count a dashboard turns into any quantile with one
    interpolation, over ≤ bins+2 stored rows, never a history rescan.

    The builder materializes the table through the SAME idempotent merge
    the stream uses (with a replayed epoch injected), so the oracle —
    a one-shot DuckDB histogram over the raw events table — verifies
    maintain + store + serve in one hash: exact integer counts, binning
    written token-identically in both engines (one IEEE subtract/divide
    + floor on a power-of-two grid).

    Scale shape: the stored relation is sketch-sized (≤ 258 rows) by
    construction, so the cumulative window runs over a bounded
    relation — the fact-sized work happened incrementally, one map-side
    combined bin count per micro-batch.
    """
    path = stored_hist_path(spark, sf_dir)
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spark.read.parquet(path)
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(F.sum("n").cast("long").alias("n"))
        .withColumn("cum_n", F.sum("n").over(w).cast("long"))
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# q_zorder_optimize_scan — scan through the OPTIMIZE-rewritten layout.
# --------------------------------------------------------------------------

# 2-D predicate rectangle on the clustered pair (l_partkey, l_suppkey):
# non-empty at every fixture scale (484 / 51 / 4 rows at sf0.001/.01/.1).
_OPT_PART_LO, _OPT_PART_HI = 10, 49
_OPT_SUPP_LO, _OPT_SUPP_HI = 0, 3
_OPT_DEBRIS_FILES = 48

_OPT_MEMO: dict[str, str] = {}


def optimized_lineitem_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the maintenance-story table: land
    lineitem as ``_OPT_DEBRIS_FILES`` small round-robin files — the
    debris shape a streaming sink leaves, unclustered so footer stats
    span the whole key domain and skip nothing — then run
    layout.optimize_zordered to rewrite it right-sized AND Z-clustered
    on (l_partkey, l_suppkey) in one pass."""
    if sf_dir not in _OPT_MEMO:
        from streaming_data_ingestion_spark.layout import optimize_zordered

        tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = artifact_path(f"lineitem_optimized_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        li = load(spark, sf_dir, "lineitem")
        li.repartition(_OPT_DEBRIS_FILES).write.mode("overwrite").parquet(path)
        n = li.count()
        optimize_zordered(
            spark,
            path,
            ["l_partkey", "l_suppkey"],
            target_rows_per_file=max(1, n // 6),
        )
        _OPT_MEMO[sf_dir] = path
    return _OPT_MEMO[sf_dir]


@query(
    "q_zorder_optimize_scan",
    oracle=f"""
SELECT
  l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  {sql_dsum("l_quantity", "sum_qty")},
  {sql_dsum("l_extendedprice", "sum_price")},
  CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
  CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
FROM lineitem
WHERE l_partkey BETWEEN {_OPT_PART_LO} AND {_OPT_PART_HI}
  AND l_suppkey BETWEEN {_OPT_SUPP_LO} AND {_OPT_SUPP_HI}
GROUP BY l_returnflag
""",
    tags=("layout", "scan", "maintenance"),
)
def q_zorder_optimize_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional range scan THROUGH the OPTIMIZE-rewritten
    lineitem: filter on (l_partkey × l_suppkey), aggregate per return
    flag — q_zorder_scan's companion for the table-MAINTENANCE story.
    q_zorder_scan proves a layout written clustered once; this one
    proves the rewrite path a real pipeline needs continuously: a
    streaming sink lands small unclustered files whose footer stats
    cover the whole key domain (zero skipping), and
    layout.optimize_zordered compacts + re-clusters them in one rewrite
    so the same scan skips most files on parquet min/max statistics
    (fewer-files + skipping asserted in tests/test_layout.py).

    The result is layout-independent — the oracle runs the identical
    filter over the RAW table in DuckDB, so the hash check also pins
    that the rewrite lost or duplicated no rows. Sums use the
    compat.dsum decimal discipline.
    """
    path = optimized_lineitem_path(spark, sf_dir)
    li = spark.read.parquet(path)
    return (
        li.filter(
            F.col("l_partkey").between(_OPT_PART_LO, _OPT_PART_HI)
            & F.col("l_suppkey").between(_OPT_SUPP_LO, _OPT_SUPP_HI)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            F.min("l_suppkey").cast("bigint").alias("min_supp"),
            F.max("l_suppkey").cast("bigint").alias("max_supp"),
        )
    )


# --------------------------------------------------------------------------
# q_cms_serving — probe-token lookups against the STORED Count-Min grid.
# --------------------------------------------------------------------------

# Fixed probe list (the dashboard's watchlist): deterministic, spanning
# hot and mid-frequency tokens of the fixture vocabulary. A probe's
# estimate is a pure grid lookup — O(1) per token, no corpus rescan.
_CMS_PROBES = (
    "scan", "join", "query", "window", "merge", "key", "value", "the",
)

_CMS_MEMO: dict[str, str] = {}


def stored_cms_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the merged Count-Min grid for ``sf_dir``
    by driving streaming/cms_stream.py's merge writer over four
    deterministic document slices, then REPLAY the final epoch — the
    q_hist_serving discipline, so the serving read proves the replay
    protocol on the frequency sketch too."""
    if sf_dir not in _CMS_MEMO:
        from streaming_data_ingestion_spark.streaming.cms_stream import (
            merge_cms_grid,
        )

        tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = artifact_path(f"documents_cms_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        docs = load(spark, sf_dir, "documents")
        wb = merge_cms_grid(path, run_ns="cms-serve")
        for e in range(4):
            wb(docs.where(F.col("doc_id") % 4 == e), e)
        wb(docs.where(F.col("doc_id") % 4 == 3), 3)  # crash-shape replay
        _CMS_MEMO[sf_dir] = path
    return _CMS_MEMO[sf_dir]


def _cms_probe_oracle() -> str:
    from streaming_data_ingestion_spark.queries.sketches import (
        _CMS_DEPTH,
        _CMS_WIDTH,
        _PHI_DENOM,
        _SQL_TOKENS,
    )

    probes = ", ".join(f"'{t}'" for t in _CMS_PROBES)
    return f"""
WITH toks AS (
  SELECT unnest({_SQL_TOKENS}) AS token FROM documents
),
rows_ AS (SELECT UNNEST(range(0, {_CMS_DEPTH})) AS r),
occ AS (
  SELECT token, r,
         ('0x' || substring(md5(token || '|cms' || r), 1, 8))::BIGINT
           % {_CMS_WIDTH} AS bucket
  FROM toks, rows_
),
cells AS (
  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM occ GROUP BY r, bucket
),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells WHERE r = 0),
probes AS (SELECT unnest([{probes}]) AS token),
pb AS (
  SELECT token, r,
         ('0x' || substring(md5(token || '|cms' || r), 1, 8))::BIGINT
           % {_CMS_WIDTH} AS bucket
  FROM probes, rows_
),
est AS (
  SELECT pb.token, CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS est
  FROM pb LEFT JOIN cells c ON c.r = pb.r AND c.bucket = pb.bucket
  GROUP BY pb.token
)
SELECT est.token, est.est, total.n AS total_occurrences,
       est.est * {_PHI_DENOM} >= total.n AS is_heavy_candidate
FROM est CROSS JOIN total
ORDER BY est.token
"""


@query(
    "q_cms_serving",
    oracle=_cms_probe_oracle(),
    tags=("serving", "sketch", "documents"),
)
def q_cms_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watchlist-token frequency estimates from the STORED Count-Min
    grid — the serving half of the frequency sketch, completing the
    trio's serving symmetry (q_hist_serving serves the distribution
    sketch; HLL serves through q_hll_rollup_union's union-estimate).
    Each probe costs 4 bucket lookups against the 4×1024 stored grid —
    O(1) per token, no corpus rescan ever — and the φ cut is the same
    integer cross-multiply as the batch sketch.

    The grid was materialized through the stream's own idempotent merge
    (4 epoch slices + a replayed final epoch), and the oracle recomputes
    the grid from the raw documents table in DuckDB — so the driver's
    hash check proves stored grid ≡ one-shot grid, i.e. the mergeable
    sketch contract, on the driver-visible path.

    Scale shape: the probe relation is watchlist-sized, the grid is
    4096 rows regardless of corpus; everything after the (incremental)
    grid build is broadcast-join lookups. CMS guarantees est ≥ exact,
    so the candidate flag can only over-admit, never miss a true heavy
    hitter.
    """
    from streaming_data_ingestion_spark.queries.sketches import (
        _CMS_DEPTH,
        _PHI_DENOM,
        _bucket,
    )

    path = stored_cms_path(spark, sf_dir)
    grid = spark.read.parquet(path).select("r", "bucket", "n")
    total = grid.filter(F.col("r") == 0).agg(
        F.sum("n").cast("long").alias("total_occurrences")
    )
    probes = spark.createDataFrame(
        [(t,) for t in _CMS_PROBES], "token string"
    )
    scored = probes
    for r in range(_CMS_DEPTH):
        grid_r = grid.filter(F.col("r") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("n").alias(f"_n{r}")
        )
        scored = scored.withColumn(
            f"_b{r}", _bucket(F.col("token"), r)
        ).join(F.broadcast(grid_r), f"_b{r}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"_n{r}"), F.lit(0)) for r in range(_CMS_DEPTH)]
    ).cast("long")
    return (
        scored.crossJoin(F.broadcast(total))
        .select(
            "token",
            est.alias("est"),
            "total_occurrences",
            (est * _PHI_DENOM >= F.col("total_occurrences")).alias(
                "is_heavy_candidate"
            ),
        )
        .orderBy("token")
    )


# --------------------------------------------------------------------------
# q_hist_quantiles — quantile readout FROM the stored histogram.
# --------------------------------------------------------------------------

_HQ_PCTS = (50, 90, 99)


@query(
    "q_hist_quantiles",
    oracle=f"""
WITH b AS (
  SELECT CASE WHEN CAST(value AS DOUBLE) < {_H_LO} THEN -1
              WHEN CAST(value AS DOUBLE) >= {_H_HI} THEN {_H_BINS}
              ELSE CAST(FLOOR((CAST(value AS DOUBLE) - {_H_LO}) / 2.0)
                        AS INTEGER) END AS bin
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bin
),
c AS (
  SELECT bin, n,
         CAST(SUM(n) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM h
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
pcts AS (SELECT UNNEST([{", ".join(str(p) for p in _HQ_PCTS)}]) AS pct),
targets AS (
  SELECT pct, (pct * tot.total + 99) // 100 AS target FROM pcts, tot
),
hit AS (
  SELECT t.pct, t.target, c.bin, c.n, c.cum - c.n AS cum_prev
  FROM targets t JOIN c ON c.cum >= t.target AND c.cum - c.n < t.target
)
SELECT
  CAST(pct AS INTEGER) AS pct,
  CAST(target AS BIGINT) AS target_rank,
  CAST(bin AS INTEGER) AS bin,
  CASE WHEN bin < 0 THEN {_H_LO}
       WHEN bin >= {_H_BINS} THEN {_H_HI}
       ELSE {_H_LO} + (CAST(bin AS DOUBLE)
            + CAST(target - cum_prev AS DOUBLE) / CAST(n AS DOUBLE)) * 2.0
  END AS value
FROM hit
ORDER BY pct
""",
    tags=("serving", "sketch", "events"),
)
def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 served FROM the stored mergeable histogram — the
    actual dashboard readout over q_hist_serving's bin relation: target
    rank by pure integer arithmetic ((p·N+99)//100), hit bin = the
    first bin whose cumulative count covers it, linear interpolation
    inside the bin (rank error ≤ one bin's mass, value error ≤ one
    2.0-wide bin, fixed at write time regardless of stream length).
    Under/overflow bins clamp to the grid edges.

    The oracle recomputes grid + cumulative walk + interpolation from
    the raw events table, so the driver hash certifies the stored
    sketch AND the serving arithmetic (one IEEE division + one multiply
    per quantile, token-identical both engines).

    Scale shape: everything after the (incremental) histogram build is
    over the ≤ 258-row stored relation × a constant 3-row percentile
    spine — a dashboard query in the true sense.
    """
    path = stored_hist_path(spark, sf_dir)
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        spark.read.parquet(path)
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(F.sum("n").cast("long").alias("n"))
        .withColumn("cum", F.sum("n").over(w).cast("long"))
    )
    tot = c.agg(F.sum("n").cast("long").alias("total"))
    pcts = spark.range(len(_HQ_PCTS)).select(
        F.element_at(
            llit_array(_HQ_PCTS),
            (F.col("id") + 1).cast("int"),
        ).alias("pct")
    )
    targets = pcts.crossJoin(F.broadcast(tot)).select(
        "pct",
        F.expr("(pct * total + 99) div 100").cast("long").alias("target"),
    )
    hit = targets.join(
        F.broadcast(c),
        (F.col("cum") >= F.col("target"))
        & (F.col("cum") - F.col("n") < F.col("target")),
    )
    frac = (F.col("target") - (F.col("cum") - F.col("n"))).cast(
        "double"
    ) / F.col("n").cast("double")
    val = (
        F.when(F.col("bin") < 0, F.lit(_H_LO))
        .when(F.col("bin") >= _H_BINS, F.lit(_H_HI))
        .otherwise(
            F.lit(_H_LO)
            + (F.col("bin").cast("double") + frac) * F.lit(2.0)
        )
    )
    return hit.select(
        F.col("pct").cast("int").alias("pct"),
        F.col("target").alias("target_rank"),
        F.col("bin").cast("int").alias("bin"),
        val.alias("value"),
    ).orderBy("pct")


# --------------------------------------------------------------------------
# q_bm25_serving — BM25 scored FROM the stored streaming-maintained
# corpus statistics (streaming/bm25_stats.py): the retrieval leg of the
# maintain→store→serve trio.
# --------------------------------------------------------------------------

_BM25_SERVE_TERMS = ("hash", "join", "stream")
_BM25_SERVE_K = 10

_BM25_STATS_MEMO: dict[str, str] = {}


def stored_bm25_stats_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the merged BM25 stats table for
    ``sf_dir`` by driving streaming/bm25_stats.py's merge writer over
    four deterministic document slices, then REPLAY the final epoch —
    the q_hist_serving discipline applied to the retrieval statistics."""
    if sf_dir not in _BM25_STATS_MEMO:
        from streaming_data_ingestion_spark.streaming.bm25_stats import (
            merge_bm25_stats,
        )

        tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = artifact_path(f"documents_bm25_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        docs = load(spark, sf_dir, "documents")
        wb = merge_bm25_stats(path, run_ns="bm25-serve")
        for e in range(4):
            wb(docs.where(F.col("doc_id") % 4 == e), e)
        wb(docs.where(F.col("doc_id") % 4 == 3), 3)  # crash-shape replay
        _BM25_STATS_MEMO[sf_dir] = path
    return _BM25_STATS_MEMO[sf_dir]


def bm25_serve(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` BM25 for an arbitrary ``terms`` query using the STORED
    corpus statistics instead of a per-query aggregation pass: the stats
    table (vocab-sized, incrementally maintained) collapses to one row
    of exact integers (N, Σdl, df per query term — absent terms read as
    df=0, exactly what a fresh aggregation would count), which
    broadcasts onto the document scan. At 100 TB this turns every search
    from scan+aggregate+scan into a single scan — the statistics were
    paid for incrementally by the stream."""
    from streaming_data_ingestion_spark.queries.llm_text import (
        _bm25_base,
        _bm25_rank_topk,
    )

    path = stored_bm25_stats_path(spark, sf_dir)
    st = spark.read.parquet(path)
    meta = F.col("kind") == "meta"
    stats = st.agg(
        F.max(F.when(meta & (F.col("term") == "n_docs"), F.col("n")))
        .cast("long")
        .alias("n_docs"),
        F.max(F.when(meta & (F.col("term") == "sum_dl"), F.col("n")))
        .cast("long")
        .alias("sum_dl"),
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("kind") == "df") & (F.col("term") == t),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    base = _bm25_base(load(spark, sf_dir, "documents"), terms)
    return _bm25_rank_topk(base, stats, len(terms), k)


def _bm25_serving_oracle(
    terms: tuple[str, ...] = None, k: int = None
) -> str:
    from streaming_data_ingestion_spark.queries.llm_text import _SQL_TOKENS

    terms = _BM25_SERVE_TERMS if terms is None else terms
    k = _BM25_SERVE_K if k is None else k
    return f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({_SQL_TOKENS}) AS BIGINT) AS dl,
         {", ".join(
           f"CAST(len(list_filter({_SQL_TOKENS}, x -> x = '{t}')) AS BIGINT)"
           f" AS tf_{i}" for i, t in enumerate(terms)
         )}
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {", ".join(
           f"CAST(count_if(tf_{i} > 0) AS BIGINT) AS df_{i}"
           for i in range(len(terms))
         )}
  FROM d
),
scored AS (
  SELECT doc_id, dl,
    ROUND(
      {" + ".join(
        f"ln((CAST(n_docs AS DOUBLE) - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (CAST(tf_{i} AS DOUBLE) * 2.2)"
        f" / (CAST(tf_{i} AS DOUBLE)"
        f"    + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)"
        f"                            / (CAST(sum_dl AS DOUBLE) / n_docs))))"
        for i in range(len(terms))
      )}, 6) AS bm25
  FROM d CROSS JOIN stats
  WHERE {" + ".join(f"tf_{i}" for i in range(len(terms)))} > 0
)
SELECT CAST(rank AS INTEGER) AS rank, doc_id, dl, bm25 FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY rank
"""


@query(
    "q_bm25_serving",
    oracle=_bm25_serving_oracle(),
    tags=("llm", "text", "serving"),
)
def q_bm25_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25 retrieval scored from the STORED streaming-maintained
    corpus statistics — the retrieval leg of the maintain→store→serve
    trio (histogram = distribution, CMS = frequency, BM25 stats =
    ranking). The builder drives streaming/bm25_stats.py's idempotent
    merge over four epoch slices PLUS a replayed final epoch; the oracle
    recomputes (N, Σdl, df) from the raw documents table — so the
    driver's hash certifies that a score served from the store is
    bit-identical to one computed by a fresh corpus aggregation,
    including the replay protocol (a broken replay skip would double df
    and flip ranks).

    Scale shape: the stats read collapses the vocab-sized stored table
    to ONE row (exact integers) that broadcasts onto the document scan —
    per-search cost is one scan instead of scan+aggregate+scan; top-k
    via orderBy+limit; rank window over ≤ k rows.
    """
    return bm25_serve(spark, sf_dir, _BM25_SERVE_TERMS, _BM25_SERVE_K)


# second driver-hashed binding — and the harder contract: one query term
# ("quantile") that exists NOWHERE in the corpus, so the stored-stats
# lookup must read df=0 through the coalesce path and score it exactly
# like the oracle's fresh count_if(...)=0, with a different k
_BM25_SERVE_TERMS_B2 = ("spark", "query", "quantile")
_BM25_SERVE_K_B2 = 8


@query(
    "q_bm25_serving_b2",
    oracle=_bm25_serving_oracle(_BM25_SERVE_TERMS_B2, _BM25_SERVE_K_B2),
    tags=("llm", "text", "serving"),
)
def q_bm25_serving_b2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second hash-certified binding of bm25_serve, including an
    absent-from-corpus term: the stored stats table has no df row for
    it, the serve path must surface df=0 (the coalesce branch
    tests/test_round7_props.py checks row-wise), and the driver hash now
    pins that the ABSENT-term idf contribution is bit-identical to a
    fresh aggregation's. Closes the one-binding-per-serving-entry gap
    (round-7 #4) for the stored-stats leg.

    Scale shape: identical to q_bm25_serving — the vocab-sized store
    collapses to one exact-integer row that broadcasts onto a single
    document scan.
    """
    return bm25_serve(spark, sf_dir, _BM25_SERVE_TERMS_B2, _BM25_SERVE_K_B2)

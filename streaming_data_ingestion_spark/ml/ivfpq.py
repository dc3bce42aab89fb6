"""IVFPQ index: the end-to-end ANN layout for 100 TB vector corpora.

Composes the pieces the query registry proves individually into the
standard two-level index (the IVF+PQ design of Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011):

- **IVF (coarse quantizer)**: k-means cells (ml/kmeans.py) partition the
  corpus; the index is WRITTEN hive-partitioned by cell
  (layout.write_partitioned), so probing nprobe cells is *partition
  pruning* — the scan never lists, let alone reads, the other cells.
- **PQ (fine quantizer)**: each vector stored as 8 small codes
  (queries/llm_similarity.pq_encode_df) — the probe scan reads ~3% of
  the vector bytes.
- **Query**: probe-cell selection is driver-side math on the tiny
  centroid table; candidates are scored with the classic per-query
  ADC lookup table (8×16 floats, precomputed once per query, riding
  into the plan as literal arrays); the top `rerank` candidates are
  re-scored exactly on the stored float vectors; top-k of that is the
  answer.

At deployment the exact `embedding` column lives in the index only for
the re-rank fetch: the ADC stage is a SEPARATE codes-only scan (its
ReadSchema provably excludes `embedding` — asserted in
tests/test_ivfpq.py), and the exact re-rank is a second scan filtered
to the ≤ rerank survivor ids, pushed into the parquet reader
(PushedFilters on vec_id), so the float-vector bytes read are
per-candidate row-group lookups, not probed-cell scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import dlit_array
from streaming_data_ingestion_spark.layout import write_partitioned
from streaming_data_ingestion_spark.ml.kmeans import assign_cells, kmeans_fit
from streaming_data_ingestion_spark.queries.llm_similarity import (
    _PQ_K,
    _PQ_SUB,
    _PQ_SUBDIM,
    pq_encode_np_df,
)


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    k_cells: int = 4,
    n_iters: int = 3,
) -> list[list[float]]:
    """Train the coarse quantizer, PQ-encode, and write the index
    partitioned by cell. Returns the trained centroids (the query-side
    routing table — at scale, a broadcast/file of k×d floats).

    ``df`` needs (vec_id, embedding). One corpus pass for assignment +
    encode (both narrow maps) and one partitioned write; k-means
    training cost is bounded by n_iters centroid-sized shuffles.
    """
    cents, _ = kmeans_fit(df, k=k_cells, n_iters=n_iters)
    assigned = assign_cells(df.select("vec_id", "embedding"), cents)
    # carry the float vector through encoding under a second name —
    # the encoder drops `embedding` from its output, and re-attaching it
    # with a vec_id join would shuffle the whole corpus (the one wide
    # stage in what is otherwise a pure narrow-map build). Encode via
    # the numpy/Arrow kernel: bit-parity to the HOF fold is asserted
    # per vector (tests/test_round11_props.py) and hash-certified by
    # q_pq_encode_np against the same oracle, at a measured ~14-37x
    # lower encode cost (docs/BENCH_NOTES.md); pq_encode_df remains the
    # registered spec path under q_pq_encode.
    coded = pq_encode_np_df(
        assigned.select(
            "vec_id", "cell", F.col("embedding").alias("emb_keep"), "embedding"
        )
    )
    # keep the float vector for exact re-rank; ADC never reads it
    # (column pruning), so the probe scan stays code-sized.
    indexed = coded.select(
        "vec_id", "cell", "codes", "sq_err",
        F.col("emb_keep").alias("embedding"),
    )
    write_partitioned(indexed, path, ["cell"])
    return cents


def auto_k_cells(
    n: int, nprobe: int = 1, min_k: int = 4, max_k: int = 1 << 18
) -> int:
    """The IVF cell-count LAW, solved for k (docs/SCALE.md
    "static sketch parameters"): per-query work = k coarse-centroid
    scores + nprobe·(n/k) ADC candidates, minimized at
    k* = sqrt(nprobe·n) — the classic k ∝ √n rule. A STATIC k is the
    same scale bug as a fixed LSH band width: cell population n/k grows
    linearly with the corpus, so ADC candidates per probe grow linearly
    and the "index" asymptotically degenerates into a scan. Integer-
    exact (isqrt + next power of two, no float log), clamped to
    [min_k, max_k]; the max_k default (262,144 cells) keeps the
    centroid routing table driver/broadcast-sized (128 MiB of float64
    at d=64). Occupancy drift on a live index is measured by
    q_ivfpq_cell_stats — rebuild with a recomputed k when mean cell
    population is ≳4× sqrt(n/nprobe)."""
    import math

    if n < 1 or nprobe < 1:
        raise ValueError("n >= 1 and nprobe >= 1 required")
    k = max(1, math.isqrt(n * nprobe))
    k_pow2 = 1 << max(0, (k - 1).bit_length())
    return min(max_k, max(min_k, k_pow2))


def _probe_cells(
    q_emb: list[float], cents: list[list[float]], nprobe: int
) -> list[int]:
    """nprobe nearest cells for a query — driver-side math over the k×d
    centroid table (ties break toward the lower cell id, matching
    kmeans assignment)."""
    dists = [
        (sum((float(x) - float(c)) ** 2 for x, c in zip(q_emb, cent)), i)
        for i, cent in enumerate(cents)
    ]
    return [i for _, i in sorted(dists)[:nprobe]]


def _adc_table(q_emb: list[float]) -> list[list[float]]:
    """The classic ADC lookup table: per subspace, the squared distance
    of the query subvector to each of the 16 codebook centroids —
    8×16 floats computed once per query (same centroid formula as
    pq_encode_df)."""
    table = []
    for s in range(_PQ_SUB):
        row = []
        for c in range(_PQ_K):
            acc = 0.0
            for d in range(_PQ_SUBDIM):
                cent = (float((c * 31 + d * 17 + s * 7) % 13) - 6.0) / 6.0
                diff = float(q_emb[s * _PQ_SUBDIM + d]) - cent
                acc = acc + diff * diff
            row.append(acc)
        table.append(row)
    return table


def adc_candidates(
    idx: DataFrame, table: list[list[float]], rerank: int
) -> DataFrame:
    """The codes-only ADC stage: score every probed row against the
    8×16 literal lookup table and keep the top ``rerank`` by
    (adc_dist, vec_id). The projection reads (vec_id, cell, codes) and
    NOTHING else — in particular not ``embedding`` — so the probed-cell
    parquet scan is code-sized (~3% of the vector bytes); asserted on
    ReadSchema in tests/test_ivfpq.py. Top-rerank is orderBy+limit
    (distributed TakeOrderedAndProject, no global window)."""
    adc = None
    for s in range(_PQ_SUB):
        lut = dlit_array(table[s])
        term = F.element_at(lut, F.element_at("codes", s + 1) + 1)
        adc = term if adc is None else adc + term
    return (
        idx.select("vec_id", "cell", adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(rerank)
    )


def fetch_vectors(
    spark: SparkSession,
    path: str,
    probe_cells: list[int],
    vec_ids: list[int],
) -> DataFrame:
    """Point-fetch the float vectors for the ≤ rerank ADC survivors:
    partition pruning on ``cell`` plus a literal vec_id IN-list pushed
    into the parquet reader (PushedFilters — row-group stats skip
    non-matching groups), so the exact-rerank read is per-candidate
    lookups, not a probed-cell scan of the 512 B/row float column."""
    return (
        spark.read.parquet(path)
        .filter(
            F.col("cell").isin(*probe_cells) & F.col("vec_id").isin(vec_ids)
        )
        .select("vec_id", "embedding")
    )


# The point-fetch serving plan collects the ADC survivors to the driver
# to build the vec_id IN-list; that is only sane while the survivor set
# is lookup-sized. Past this bound (brute-force-convergence calls pass
# rerank = corpus) the query stays fully lazy/distributed instead:
# survivors broadcast-join back onto the probed scan for exact re-rank.
_COLLECT_RERANK_MAX = 1024


def _exact_dist_to(q_emb: list[float]) -> Column:
    """Exact squared-L2 of the stored ``embedding`` to the literal
    query — the shared re-rank expression of both serving plans."""
    q_arr = dlit_array(q_emb)
    return F.aggregate(
        F.zip_with(
            F.col("embedding"),
            q_arr,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def serve_topk(
    spark: SparkSession,
    idx: DataFrame,
    fetch_builder,
    q_emb: list[float],
    k: int,
    rerank: int,
) -> DataFrame:
    """The shared ADC→exact-re-rank serve core behind every stored-index
    probe (query_ivfpq here, the generation probe in
    streaming/ann_stream.py). ``idx`` is the ALREADY-BOUNDED codes scan
    (cell pruning, and any committed-epoch bound, composed in by the
    caller); ``fetch_builder(vec_ids) -> DataFrame[(vec_id, embedding)]``
    returns the float point-fetch under the SAME bounds. One
    implementation means one place for the two-plan contract:

    * lookup-sized ``rerank``: codes-only ADC cut → bounded ≤ rerank-row
      collect → vec_id-pushed point fetch for exact scoring (float bytes
      read for ≤ rerank rows total);
    * ``rerank`` past _COLLECT_RERANK_MAX: stays lazy — the ADC cut
      broadcast-joins back onto the probed scan, never materializing a
      corpus-sized survivor set on the driver.
    """
    table = _adc_table(q_emb)

    if rerank > _COLLECT_RERANK_MAX:
        cand = adc_candidates(idx, table, rerank)
        return (
            idx.select("vec_id", "embedding")
            .join(F.broadcast(cand), "vec_id")
            .select(
                "vec_id", "cell", "adc_dist",
                _exact_dist_to(q_emb).alias("exact_dist"),
            )
            .orderBy(F.col("exact_dist").asc(), F.col("vec_id").asc())
            .limit(k)
        )

    cell_t = idx.schema["cell"].dataType.simpleString()
    survivors = adc_candidates(idx, table, rerank).collect()
    if not survivors:
        return spark.createDataFrame(
            [],
            f"vec_id long, cell {cell_t}, adc_dist double, exact_dist double",
        )
    # doubles round-trip exactly through collect/createDataFrame (IEEE
    # bit patterns preserved), so re-attaching adc_dist is hash-safe
    surv_df = F.broadcast(
        spark.createDataFrame(
            [(r["vec_id"], int(r["cell"]), r["adc_dist"]) for r in survivors],
            f"vec_id long, cell {cell_t}, adc_dist double",
        )
    )
    fetched = fetch_builder([r["vec_id"] for r in survivors])
    return (
        fetched.join(surv_df, "vec_id")
        .select(
            "vec_id", "cell", "adc_dist",
            _exact_dist_to(q_emb).alias("exact_dist"),
        )
        .orderBy(F.col("exact_dist").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def query_ivfpq(
    spark: SparkSession,
    path: str,
    cents: list[list[float]],
    q_emb: list[float],
    nprobe: int = 2,
    k: int = 5,
    rerank: int = 20,
) -> DataFrame:
    """Top-k neighbors of ``q_emb``: partition-pruned probe → codes-only
    ADC lookup scoring → exact re-rank of the top ``rerank`` ADC
    candidates (the two-plan contract of serve_topk).

    The cell filter is a literal IN-list over the partition column, so
    it lands in PartitionFilters (asserted in tests/test_ivfpq.py) —
    non-probed cells cost nothing. The ADC stage (adc_candidates) never
    projects ``embedding``; float-vector bytes are read for ≤ rerank
    rows total via the vec_id-pushed point scan (fetch_vectors), never
    for every probed row.
    """
    probes = _probe_cells(q_emb, cents, nprobe)
    idx = spark.read.parquet(path).filter(F.col("cell").isin(*probes))
    return serve_topk(
        spark,
        idx,
        lambda ids: fetch_vectors(spark, path, probes, ids),
        q_emb,
        k,
        rerank,
    )

"""Near-duplicate detection operators (north-star mandate: MinHash+LSH,
SimHash, n-gram Jaccard — SURVEY.md §2B "LLM-data-pipeline operators").

Design for 100 TB:
- Signatures (minhash, simhash, fingerprints) are computed in one pass per
  document with higher-order array functions or one explode+re-aggregate —
  never a self-join over raw text.
- Candidate generation is banded (LSH): documents only meet if a band hash
  collides, so the join key is a short hash, and the pair space is the
  collision space, not n².
- The exact verify (Jaccard) runs only on candidate pairs.

Everything here is still DuckDB-expressible (md5 + list functions exist in
both engines), so even the LSH pipeline is value-checked against an oracle,
not just rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load

# Shared tokenization (same as llm_text).
_SQL_TOKENS = "list_filter(str_split(trim(text), ' '), t -> t != '')"


def _tokens() -> Column:
    return F.filter(F.split(F.trim(F.col("text")), " "), lambda t: t != "")


# Word 3-gram shingles as an array column (no explode).
#
# Built as a zip of three slices of the token array rather than
# transform(sequence, i -> element_at(t, i)...): the lambda body of the
# latter references the token-array expression per element, and after
# CollapseProject inlines it, each element_at re-evaluates the split —
# O(tokens²) per row (measured 10× slower at sf0.1). With slices the
# token array is evaluated three times total per row, O(tokens).
def _shingles(t: Column) -> Column:
    m = F.greatest(F.size(t) - 2, F.lit(1))
    z = F.arrays_zip(F.slice(t, 1, m), F.slice(t, 2, m), F.slice(t, 3, m))
    return F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]))


_SQL_SHINGLES = f"""
list_transform(
  range(1, greatest(len({_SQL_TOKENS}) - 1, 2)),
  i -> concat_ws(' ', {_SQL_TOKENS}[i], {_SQL_TOKENS}[i+1], {_SQL_TOKENS}[i+2])
)
"""

_N_HASHES = 12
_N_BANDS = 3  # 4 hashes per band


# --------------------------------------------------------------------------
# q_dedup_minhash — banded MinHash signatures (the LSH index itself).
# --------------------------------------------------------------------------


# 12 permutations from ONE md5 call per shingle: the first 8 hex chars are
# a 32-bit base hash x; permutation j is the universal-family affine map
# (a_j·x + b_j) mod p with p the largest 32-bit prime. a_j < 2^30 keeps
# a_j·x < 2^62 — no 64-bit overflow in either engine, so Spark and DuckDB
# compute bit-identical signatures with plain integer arithmetic. (An
# earlier scheme derived the 12 permutations from 3 salted md5 calls per
# shingle: 3× the hashing plus 12 string-min aggregates; the affine form
# is one hash, one hex→int parse, and 12 long multiply-mods per shingle.)

_P = 4294967291  # largest prime < 2^32
import hashlib as _hashlib  # noqa: E402


def _affine_consts() -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs derived from md5 — no RNG."""
    out = []
    for j in range(_N_HASHES):
        a = int(_hashlib.md5(f"a{j}".encode()).hexdigest()[:8], 16) % (1 << 30) | 1
        b = int(_hashlib.md5(f"b{j}".encode()).hexdigest()[:8], 16) % _P
        out.append((a, b))
    return out


_AFFINE = _affine_consts()

_SQL_SIGS = f"""
WITH ex AS (
  SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM documents
),
hashed AS (
  SELECT doc_id, ('0x' || substring(md5(s), 1, 8))::BIGINT AS x
  FROM ex
),
sigs AS (
  SELECT doc_id,
    {", ".join(
        f"MIN(({a} * x + {b}) % {_P}) AS mh{j}"
        for j, (a, b) in enumerate(_AFFINE)
    )}
  FROM hashed GROUP BY doc_id
)
"""

_Q_MINHASH_ORACLE = f"""
{_SQL_SIGS}
SELECT doc_id, band_idx, band_hash FROM (
  SELECT doc_id, 0 AS band_idx,
         md5(concat_ws('|', mh0, mh1, mh2, mh3)) AS band_hash FROM sigs
  UNION ALL
  SELECT doc_id, 1, md5(concat_ws('|', mh4, mh5, mh6, mh7)) FROM sigs
  UNION ALL
  SELECT doc_id, 2, md5(concat_ws('|', mh8, mh9, mh10, mh11)) FROM sigs
)
"""


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id × (mh0..mh11): the raw 12-permutation MinHash signatures.

    One explode computes each shingle's single md5 exactly once; the 12
    permutations are affine transforms of its 32-bit prefix (codegen'd
    long arithmetic), and the groupBy partial-aggregates the 12 running
    minima map-side — the shuffle carries one 12-long signature row per
    document per partition, not the shingle stream. (An earlier
    single-pass higher-order-function version recomputed the shingle
    array for each of the 12 signature columns after CollapseProject
    inlined it: 12× the work.)
    """
    return minhash_sigs_df(load(spark, sf_dir, "documents"))


def minhash_sigs_df(d: DataFrame) -> DataFrame:
    """Signature core over any (doc_id, text) DataFrame — shared with the
    streaming dedup path (streaming/dedup_stream.py), which uses it to
    band the HISTORICAL side.

    The shingle md5 + 12 affine mins are the dedup family's most
    CPU-dominant pass, so a narrow scan spreads to full parallelism
    first (tables.spread_for_cpu — a no-op on wide 100 TB scans and on
    the streaming callers' non-scan frames)."""
    from streaming_data_ingestion_spark.tables import spread_for_cpu

    ex = spread_for_cpu(d.select("doc_id", "text")).select(
        "doc_id", F.explode(_shingles(_tokens())).alias("s")
    )
    hashed = ex.select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("x"),
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(_P)).alias(f"mh{j}")
            for j, (a, b) in enumerate(_AFFINE)
        ]
    )


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id × (band_idx, band_hash): the signatures folded into 3 LSH
    bands of 4 (see _minhash_sigs for the signature scale shape)."""
    return minhash_bands_df(load(spark, sf_dir, "documents"))


def minhash_bands_df(d: DataFrame) -> DataFrame:
    """Band table over any (doc_id, text) DataFrame — the LSH index
    build, shared with streaming/dedup_stream.py's historical side.

    The 3 band rows per document explode ROW-SIDE from one projection
    (the CMS-grid idiom) — a union of 3 selects over the signature
    frame would replicate the whole 12-minhash subtree 3× in every
    consumer's plan, tripling the shingle/hash compute of the dedup
    family's most expensive stage."""
    sigs = minhash_sigs_df(d)
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[F.col(f"mh{4 * b + k}") for k in range(4)],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band_idx", "bb.band_hash")


@query("q_dedup_minhash", oracle=_Q_MINHASH_ORACLE, tags=("llm", "dedup", "lsh"))
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature → LSH bands, one row per (doc, band).

    Shingle → 12 minhash permutations (md5 with per-permutation salt) →
    3 bands of 4. All per-document array math — zero shuffles until a
    consumer groups by band_hash. Near-dups collide in ≥1 band with
    probability 1-(1-s^4)^3 for Jaccard similarity s.
    """
    return _minhash_bands(spark, sf_dir)


# --------------------------------------------------------------------------
# q_dedup_minhash_pairs — LSH candidate pairs (band-hash join).
# --------------------------------------------------------------------------


_SQL_PAIRS = f"""
WITH bands AS ({_Q_MINHASH_ORACLE})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
"""


# Bounded persist registry for the graph queries (pagerank, triangles):
# at most one cached intermediate alive per query key regardless of how
# many sf_dirs the session touches — see caching.bounded_persist.
from streaming_data_ingestion_spark.caching import (  # noqa: E402
    _REGISTRY as _PERSIST_REGISTRY,
    bounded_persist as _bounded_persist,
)


def _lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b) LSH collision pairs — the shared candidate set for
    every exact-verify stage (Jaccard, edit distance, cluster build)."""
    bands = _minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


@query(
    "q_dedup_minhash_pairs",
    oracle=_SQL_PAIRS,
    tags=("llm", "dedup", "lsh"),
)
def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: documents sharing any LSH band.

    The join key is (band_idx, band_hash) — a hash join whose output is
    the collision set only. This is the scale path: n² never happens;
    skew (a degenerate band bucket) is handled by AQE skew-join splitting.
    """
    return _lsh_candidate_pairs(spark, sf_dir)


# --------------------------------------------------------------------------
# q_dedup_simhash — 32-bit SimHash fingerprints.
# --------------------------------------------------------------------------

_HIGH_HEX = "('8','9','a','b','c','d','e','f')"


@query(
    "q_dedup_simhash",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, md5(t) AS h
  FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents)
),
votes AS (
  SELECT doc_id,
    {", ".join(
        f"SUM(CASE WHEN substring(h, {i + 1}, 1) IN {_HIGH_HEX} "
        f"THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32)
    )}
  FROM tok GROUP BY doc_id
)
SELECT doc_id,
  {" || ".join(f"(CASE WHEN v{i} >= 0 THEN '1' ELSE '0' END)" for i in range(32))}
  AS simhash
FROM votes
""",
    tags=("llm", "dedup"),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per-token md5, one vote per bit (high bit of each hex
    digit → 32 bits), majority vote per document.

    One explode + one re-aggregate: md5 is computed once per token, the
    32 votes are just substring tests, and the groupBy(doc_id) partial-
    aggregates map-side. Documents with small Hamming distance between
    simhashes are near-dups.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("t")).select(
        "doc_id", F.md5("t").alias("h")
    )
    high = [str(x) for x in "89abcdef"]
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("h", i + 1, 1).isin(high), 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(32)
        ]
    )
    bit_cols = [
        F.when(F.col(f"v{i}") >= 0, "1").otherwise("0") for i in range(32)
    ]
    return votes.select("doc_id", F.concat(*bit_cols).alias("simhash"))


# --------------------------------------------------------------------------
# q_dedup_ngram_jaccard — exact token-set Jaccard on bounded candidates.
# --------------------------------------------------------------------------


@query(
    "q_dedup_ngram_jaccard",
    oracle=f"""
WITH pairs AS ({_SQL_PAIRS}),
toks AS (
  SELECT doc_id, list_distinct({_SQL_TOKENS}) AS ts
  FROM documents
)
SELECT
  p.doc_a,
  p.doc_b,
  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
    / len(list_distinct(list_concat(a.ts, b.ts))) AS jaccard
FROM pairs p
JOIN toks a ON p.doc_a = a.doc_id
JOIN toks b ON p.doc_b = b.doc_id
WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
    / len(list_distinct(list_concat(a.ts, b.ts))) >= 0.5
""",
    tags=("llm", "dedup", "lsh"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-token Jaccard verify over the LSH collision set,
    keeping pairs ≥ 0.5.

    The candidate scope is q_dedup_minhash_pairs' band-collision output —
    collision-sized, never n² — joined back to the token sets with two
    equi hash joins on doc_id. This is the production verify stage: cheap
    signatures shrink the pair space, exact Jaccard confirms. Set sizes
    come from array_intersect/array_union, order-insensitive and
    engine-agnostic.
    """
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_tokens()).alias("ts")
    )
    a = toks.select(
        F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a")
    )
    b = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b")
    )
    jac = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b"))).cast(
        "double"
    ) / F.size(F.array_union(F.col("ts_a"), F.col("ts_b")))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# --------------------------------------------------------------------------
# q_dedup_edit_distance — exact Levenshtein verify on candidate pairs.
# --------------------------------------------------------------------------


@query(
    "q_dedup_edit_distance",
    oracle=f"""
WITH pairs AS ({_SQL_PAIRS})
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist
FROM pairs p
JOIN documents a ON p.doc_a = a.doc_id
JOIN documents b ON p.doc_b = b.doc_id
WHERE levenshtein(a.text, b.text) <= 400
""",
    tags=("llm", "dedup", "lsh"),
)
def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level edit-distance verify over the LSH collision set,
    keeping pairs within distance 400.

    Levenshtein is the expensive exact check a dedup pipeline runs LAST,
    after cheap signatures (minhash bands, simhash) have shrunk the pair
    space — so its input here is q_dedup_minhash_pairs' collision set
    (joined back to text with two equi hash joins), never an all-pairs
    scope. Character granularity catches edits inside words that
    token-level Jaccard misses. Built-in JVM implementation in both
    engines, same unit-cost DP definition, so distances are
    integer-identical.
    """
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", dist.alias("edit_dist"))
        .filter(F.col("edit_dist") <= 400)
    )


# --------------------------------------------------------------------------
# q_dedup_clusters — connected components over the LSH candidate-pair
# graph: the step that turns "candidate pairs" into an actual dedup
# decision (one canonical keeper per near-dup cluster).
# --------------------------------------------------------------------------

_Q_CLUSTERS_ORACLE = f"""
WITH RECURSIVE
pairs AS ({_SQL_PAIRS}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(id, r) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
),
comp AS (SELECT id, LEAST(id, MIN(r)) AS cluster_id FROM reach GROUP BY id)
SELECT
  d.doc_id,
  COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
  COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS is_canonical
FROM documents d
LEFT JOIN comp c ON d.doc_id = c.id
"""


@query("q_dedup_clusters", oracle=_Q_CLUSTERS_ORACLE, tags=("llm", "dedup", "lsh"))
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components of the LSH pair graph.

    Every document gets ``cluster_id`` = the minimum doc_id reachable
    through candidate-pair edges (itself if unpaired); ``is_canonical``
    marks the one keeper per cluster — dropping the rest IS the dedup.

    Distributed min-label propagation with pointer jumping: each round
    (a) pulls the min label across graph edges, then (b) replaces each
    label by its label's label (path halving), so convergence is
    O(log diameter) rounds, not O(diameter). Each round is two hash
    joins + one aggregate on the (small) edge/label sets — never a
    driver-side graph. Labels are monotonically non-increasing, so the
    fixpoint test is one cheap SUM comparison per round — and that SUM is
    the round's ONLY action: the new label set is a lazy localCheckpoint
    materialized inside the same job, so each round costs one Spark job
    (not three) and lineage stays O(1) deep. This is
    the same alternating-contraction family as large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    which is the production choice when the pair graph itself is
    petabyte-scale. Oracle: DuckDB WITH RECURSIVE reachability.
    """
    # Materialize the LSH pair pipeline once (the union below reads it
    # twice), then iterate ONLY over vertices that appear in some pair:
    # unpaired documents trivially keep their own label, and at corpus
    # scale the active vertex set (LSH collisions) is orders of magnitude
    # smaller than the corpus — joining the full corpus per round would
    # be the actual scale bug.
    pairs = q_dedup_minhash_pairs(spark, sf_dir).persist()
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    # Seed each vertex with min(self, direct neighbours) — one aggregation
    # that is exactly the first relaxation round, so typical near-dup
    # clusters (cliques / short paths from LSH collisions) start at or one
    # hop from the fixpoint and the loop usually runs a single
    # confirmation round.
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .withColumnRenamed("src", "doc_id")
        .localCheckpoint(eager=False)
    )
    for _ in range(64):  # ⌈log2⌉ bound; real corpora converge in < 10
        # (a) edge relaxation: label ← min(label, min over neighbours).
        nbr = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_min"))
        )
        relaxed = (
            labels.join(nbr, labels.doc_id == nbr.dst, "left")
            .select(
                "doc_id",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
        ).localCheckpoint(eager=False)
        # Convergence check BEFORE the pointer jump: with the symmetric
        # edge set, a relaxation that changes nothing means every edge
        # has equal labels on both ends — labels are constant per
        # component and pinned to the component min at its min vertex,
        # i.e. the EXACT fixpoint. The final round therefore skips the
        # label(label) self-join entirely (the earlier shape ran
        # relax+jump+sum every round and needed one extra full round to
        # observe an unchanged checksum). One action per round, as
        # before: the lazy localCheckpoint materializes inside this job.
        n_changed = relaxed.filter(F.col("label") < F.col("_old")).count()
        if n_changed == 0:
            break
        # (b) pointer jumping: label ← label(label). Labels are always
        # doc_ids, so the self-join is total.
        relaxed = relaxed.drop("_old")
        x, y = relaxed.alias("x"), relaxed.alias("y")
        labels = (
            x.join(y, F.col("x.label") == F.col("y.doc_id"))
            .select(F.col("x.doc_id"), F.col("y.label").alias("label"))
            .localCheckpoint(eager=False)
        )
    pairs.unpersist()
    docs = load(spark, sf_dir, "documents").select("doc_id")
    lab = labels.withColumnRenamed("doc_id", "vid")
    cluster = F.coalesce(F.col("label"), F.col("doc_id"))
    return (
        # No broadcast hint: AQE broadcasts the label side when the
        # collision set is small, and falls back to a shuffle join when a
        # pathological corpus makes it large.
        docs.join(lab, docs.doc_id == lab.vid, "left")
        .select(
            "doc_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("doc_id")).alias("is_canonical"),
        )
    )


# --------------------------------------------------------------------------
# q_dedup_chunk — chunk-level (sub-document) duplication statistics.
# --------------------------------------------------------------------------


@query(
    "q_dedup_chunk",
    oracle="""
WITH t AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), x -> x != '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(toks, start + 1, start + 32), ' '))
           AS digest
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(0, len(toks) - 1, 24)) AS start
    FROM t
  )
),
dd AS (SELECT digest, COUNT(DISTINCT doc_id) AS n_docs_with FROM c GROUP BY 1)
SELECT
  c.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(COUNT(*) FILTER (n_docs_with >= 2) AS BIGINT) AS n_shared_chunks,
  CAST(COUNT(*) FILTER (n_docs_with >= 2) AS DOUBLE) / COUNT(*)
    AS shared_chunk_frac
FROM c JOIN dd USING (digest)
GROUP BY 1
""",
    tags=("llm", "dedup"),
)
def q_dedup_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: how much of each document is made of 32-token
    chunks that also appear in *other* documents — the boilerplate /
    template-text signal document-level dedup cannot see.

    Reuses the q_doc_chunk chunker (32-token window, 24 stride), hashes
    each chunk, counts distinct containing docs per digest, and joins
    the frequency back for a per-document shared fraction. Only 32-char
    digests ever shuffle — never chunk text — through two digest-keyed
    exchanges (count, join-back) and one doc_id rollup; every aggregate
    partial-combines map-side. The whole-doc analog is q_dedup_exact;
    clusters of near-dup whole docs are q_dedup_clusters.
    """
    from streaming_data_ingestion_spark.queries.llm_pipeline import (
        chunk_documents,
    )

    d = load(spark, sf_dir, "documents")
    ch = chunk_documents(d).select(
        "doc_id", F.md5(F.col("chunk_text")).alias("digest")
    )
    dd = ch.groupBy("digest").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    shared = F.sum(F.when(F.col("n_docs_with") >= 2, 1).otherwise(0)).cast(
        "bigint"
    )
    return (
        ch.join(dd, "digest")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            shared.alias("n_shared_chunks"),
            (shared.cast("double") / F.count(F.lit(1))).alias(
                "shared_chunk_frac"
            ),
        )
    )


# --------------------------------------------------------------------------
# q_minhash_jaccard — sketch-estimated vs exact Jaccard on candidates.
# --------------------------------------------------------------------------

_SQL_AGREE = " + ".join(
    f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END"
    for j in range(_N_HASHES)
)


@query(
    "q_minhash_jaccard",
    oracle=f"""
{_SQL_SIGS},
bands AS (
  SELECT doc_id, 0 AS band_idx,
         md5(concat_ws('|', mh0, mh1, mh2, mh3)) AS band_hash FROM sigs
  UNION ALL
  SELECT doc_id, 1, md5(concat_ws('|', mh4, mh5, mh6, mh7)) FROM sigs
  UNION ALL
  SELECT doc_id, 2, md5(concat_ws('|', mh8, mh9, mh10, mh11)) FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx
              AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform({_SQL_SHINGLES}, s -> md5(s))) AS shs
  FROM documents
)
SELECT
  doc_a,
  doc_b,
  CAST({_SQL_AGREE} AS INTEGER) AS n_agree,
  ({_SQL_AGREE}) / 12.0 AS est_jaccard,
  CAST(len(list_intersect(ha.shs, hb.shs)) AS DOUBLE)
    / (len(ha.shs) + len(hb.shs) - len(list_intersect(ha.shs, hb.shs)))
    AS exact_jaccard
FROM pairs
JOIN sigs sa ON sa.doc_id = doc_a
JOIN sigs sb ON sb.doc_id = doc_b
JOIN sh ha ON ha.doc_id = doc_a
JOIN sh hb ON hb.doc_id = doc_b
""",
    tags=("llm", "dedup", "lsh"),
)
def q_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every LSH candidate pair: the sketch-estimated Jaccard
    (fraction of agreeing MinHash components) next to the exact
    distinct-shingle Jaccard — the estimator and its ground truth in one
    result, which is how a pipeline calibrates its dedup threshold.

    The estimate needs only the 12-long signatures (the LSH index a
    production system persists anyway — here the lineage recomputes
    them, at scale you'd read the materialized sigs table); the exact
    side joins per-doc distinct shingle-hash arrays on the *bounded*
    candidate scope, never all pairs. est = n_agree/12 and
    exact = |∩|/|∪| are single IEEE divisions of exact integers.
    """
    pairs = q_dedup_minhash_pairs(spark, sf_dir)
    sigs = _minhash_sigs(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.transform(_shingles(_tokens()), lambda s: F.md5(s))
        ).alias("shs"),
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(_N_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(_N_HASHES)],
    )
    ha = sh.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    hb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    n_agree = None
    for j in range(_N_HASHES):
        term = (F.col(f"a{j}") == F.col(f"b{j}")).cast("int")
        n_agree = term if n_agree is None else n_agree + term
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_agree.alias("n_agree"),
            (n_agree.cast("double") / 12.0).alias("est_jaccard"),
            (
                inter.cast("double")
                / (F.size("shs_a") + F.size("shs_b") - inter)
            ).alias("exact_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# q_graph_degree — degree distribution of the candidate-pair graph.
# --------------------------------------------------------------------------


@query(
    "q_graph_degree",
    oracle=f"""
WITH bands AS ({_Q_MINHASH_ORACLE}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx
              AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
deg AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT doc_a AS id FROM pairs UNION ALL SELECT doc_b FROM pairs)
  GROUP BY id
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM deg
GROUP BY degree
""",
    tags=("llm", "dedup", "lsh"),
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the LSH candidate graph: how many
    documents have 1, 2, … near-dup candidates.

    This is the skew diagnostic for the dedup pipeline — a heavy tail
    here means a degenerate band bucket (boilerplate shingles) that
    will hot-spot the pair join and the cluster propagation, and is the
    signal to widen bands or cap buckets. Two tiny aggregates over the
    (collision-sized, never n²) pair list.
    """
    pairs = q_dedup_minhash_pairs(spark, sf_dir)
    # both endpoints explode row-side from ONE pass over the pair list —
    # a union of two selects would replicate the whole LSH pair subtree
    ids = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("id")
    )
    deg = ids.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------
# q_cross_dedup — cross-source duplicate contamination matrix.
# --------------------------------------------------------------------------


@query(
    "q_cross_dedup",
    oracle=f"""
WITH pairs AS ({_SQL_PAIRS}),
src AS (SELECT doc_id, source FROM documents)
SELECT
  LEAST(sa.source, sb.source) AS source_a,
  GREATEST(sa.source, sb.source) AS source_b,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT CASE WHEN sa.source <= sb.source
                           THEN p.doc_a ELSE p.doc_b END) AS BIGINT)
    AS n_docs_a
FROM pairs p
JOIN src sa ON p.doc_a = sa.doc_id
JOIN src sb ON p.doc_b = sb.doc_id
WHERE sa.source <> sb.source
GROUP BY source_a, source_b
ORDER BY n_pairs DESC, source_a, source_b
""",
    tags=("llm", "dedup", "lsh"),
)
def q_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every unordered pair of
    corpus sources, how many LSH near-dup candidate pairs span them,
    and how many distinct documents of the lexically-smaller source are
    involved. This is the dataset-curation question ("how much of
    source B is already in source A?") that decides dedup-before-mix
    weighting — and the per-pair twin of q_decontaminate's train/test
    overlap check.

    Plan: the candidate set is the LSH collision join (never n²); the
    two source lookups are hash joins on doc_id against a 2-column
    pruned documents scan (at 100 TB: sort-merge on doc_id, or a
    broadcast if the id→source map is dimension-sized); the matrix
    aggregate is ≤|sources|²-sized with map-side partials.
    """
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
    )
    sb = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")
    )
    doc_in_a = F.when(
        F.col("src_a") <= F.col("src_b"), F.col("doc_a")
    ).otherwise(F.col("doc_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("src_a") != F.col("src_b"))
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct(doc_in_a).alias("n_docs_a"),
        )
        .orderBy(F.col("n_pairs").desc(), F.col("source_a"), F.col("source_b"))
    )


# --------------------------------------------------------------------------
# q_pagerank — 3 power iterations over the LSH candidate graph.
# --------------------------------------------------------------------------

_PR_D = 0.85  # damping
_PR_ITERS = 3


def _pr_sql() -> str:
    """DuckDB: unrolled power iteration (3 steps) over the collision
    graph, with decimal-exact contribution sums mirroring the Spark
    side's fold order-independence.

    The damping constants are emitted as VARCHAR→DOUBLE casts of the
    PYTHON doubles: a bare SQL literal like ``1.0 - 0.85`` is DuckDB
    DECIMAL arithmetic (exactly 0.15), while the Spark side computes
    ``1.0 - 0.85`` in IEEE double (0.15000000000000002). The 1-ulp base
    difference is normally absorbed by the final rounding, but at sf1
    magnitudes it crossed a rounding boundary on 6 of 4761 nodes — the
    scale-dependent last-ulp divergence the decade-step oracle gate
    exists to catch (round 10)."""
    prelude = f"""
WITH pairs AS ({_SQL_PAIRS}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
deg AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT id, 1.0 / (SELECT n FROM n) AS r FROM nodes)
"""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(f"""
r{i + 1} AS (
  SELECT
    nodes.id,
    CAST('{(1.0 - _PR_D)!r}' AS DOUBLE) / (SELECT n FROM n)
      + CAST('{_PR_D!r}' AS DOUBLE) * COALESCE(CAST(CAST(SUM(
          CAST(r{i}.r / deg.d AS DECIMAL(38,18))
        ) AS VARCHAR) AS DOUBLE), 0.0) AS r
  FROM nodes
  LEFT JOIN edges ON edges.dst = nodes.id
  LEFT JOIN r{i} ON r{i}.id = edges.src
  LEFT JOIN deg ON deg.id = edges.src
  GROUP BY nodes.id
)""")
    return (
        prelude
        + ","
        + ",".join(steps)
        + f"""
SELECT id AS doc_id, r AS rank
FROM r{_PR_ITERS}
ORDER BY rank DESC, doc_id ASC
LIMIT 20
"""
    )


@query("q_pagerank", oracle=_pr_sql(), tags=("llm", "dedup", "graph"))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, d=0.85) over the LSH candidate
    graph: which documents sit at the center of near-dup neighborhoods
    — the centrality ranking that picks canonical keepers and surfaces
    boilerplate hubs (template pages collide with everything and rank
    high).

    Exactness across engines for an ITERATIVE float algorithm: each
    node's incoming contributions (r/deg — one IEEE division per edge)
    are summed through DECIMAL(38,18), so within-iteration aggregation
    order cannot drift, and the per-iteration scalar math is identical
    IEEE. The oracle unrolls the same three steps as nested CTEs.

    Scale shape: per iteration ONE join of the edge list (collision-
    sized, never n²) against the current rank vector on src, then a
    dst-keyed aggregate — the q_dedup_clusters iteration pattern minus
    the fixpoint loop (fixed 3 steps ⇒ plan fully unrolled, no
    driver-side convergence scalar needed).
    """
    def _build_edges() -> DataFrame:
        # both orientations explode row-side from ONE pass over the pair
        # list (a union of two selects would compute it twice per build)
        pairs = _lsh_candidate_pairs(spark, sf_dir)
        return pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst"),
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"),
                        F.col("doc_a").alias("dst"),
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")

    # persisted via the bounded registry: the edge list feeds the node
    # set, the degree pass, and one join per power iteration; nodes and
    # deg are themselves node-count-bounded and referenced once per
    # UNROLLED iteration (the 3-step plan re-aggregates each reference
    # independently), so they persist too — 7 bounded aggregates over
    # the edge cache collapse to 2
    edges = _bounded_persist("q_pagerank.edges", sf_dir, _build_edges)
    nodes = _bounded_persist(
        "q_pagerank.nodes",
        sf_dir,
        lambda: edges.select(F.col("src").alias("id")).distinct(),
    )
    deg = _bounded_persist(
        "q_pagerank.deg",
        sf_dir,
        lambda: edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("d")
        ),
    )
    n = nodes.count()

    ranks = nodes.select("id", (F.lit(1.0) / n).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("id", "src_id"),
                       F.col("src") == F.col("src_id"))
            .join(deg.withColumnRenamed("id", "deg_id"),
                  F.col("src") == F.col("deg_id"))
            .select(
                F.col("dst").alias("id"),
                (F.col("r") / F.col("d")).cast("decimal(38,18)").alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(
            F.sum("c").cast("double").alias("s")
        )
        ranks = (
            nodes.join(summed, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - _PR_D) / n)
                    + F.lit(_PR_D) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
    out = (
        ranks.select(F.col("id").alias("doc_id"), F.col("r").alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    return out


# --------------------------------------------------------------------------
# q_graph_triangles — triangle census of the LSH candidate graph.
# --------------------------------------------------------------------------


@query(
    "q_graph_triangles",
    oracle=f"""
WITH pairs AS ({_SQL_PAIRS}),
tri AS (
  SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
  FROM pairs e1
  JOIN pairs e2 ON e1.doc_b = e2.doc_a
  JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
tn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  )
  GROUP BY node
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src)
SELECT
  deg.id AS doc_id,
  COALESCE(tn.n_triangles, 0) AS n_triangles,
  deg.degree,
  CASE WHEN deg.degree >= 2
       THEN CAST(2 * COALESCE(tn.n_triangles, 0) AS DOUBLE)
            / (deg.degree * (deg.degree - 1))
       ELSE CAST(0.0 AS DOUBLE) END AS clustering
FROM deg LEFT JOIN tn ON tn.node = deg.id
ORDER BY n_triangles DESC, doc_id ASC
LIMIT 20
""",
    tags=("llm", "dedup", "graph"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + local clustering coefficient over the LSH
    candidate graph: triangle-dense neighborhoods are template/boilerplate
    families (every page collides with every other), the structures a
    dedup policy treats differently from isolated near-dup pairs.

    Enumeration is the compact-forward algorithm on canonical edges
    (doc_a < doc_b): two equi self-joins of the collision-sized edge
    list — each triangle found exactly once as x<y<z, never a cartesian.
    The per-node rollup explodes each triangle to its 3 corners and
    partial-aggregates map-side; clustering = 2·tri / (deg·(deg−1)) is
    exact-integer math with one IEEE division.
    """
    # persisted via the bounded registry: the pair set feeds three
    # self-join arms + the degree pass (same lifecycle as q_pagerank's
    # edge cache — at most one entry alive regardless of sf_dirs seen)
    p = _bounded_persist(
        "q_graph_triangles.pairs",
        sf_dir,
        lambda: _lsh_candidate_pairs(spark, sf_dir),
    )
    e1, e2, e3 = p.alias("e1"), p.alias("e2"), p.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.doc_b") == F.col("e2.doc_a"))
        .join(
            e3,
            (F.col("e3.doc_a") == F.col("e1.doc_a"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("x"),
            F.col("e1.doc_b").alias("y"),
            F.col("e2.doc_b").alias("z"),
        )
    )
    tn = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    edges = p.selectExpr("doc_a AS src", "doc_b AS dst").unionAll(
        p.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return (
        deg.join(tn, deg.id == tn.node, "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            "degree",
            F.when(
                F.col("degree") >= 2,
                (2 * F.coalesce("n_triangles", F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
        .orderBy(F.desc("n_triangles"), F.asc("doc_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q_graph_reach — bounded-depth BFS over the LSH graph (recursive CTE).
# --------------------------------------------------------------------------

_REACH_DEPTH = 3


@query(
    "q_graph_reach",
    oracle=f"""
WITH RECURSIVE pairs AS ({_SQL_PAIRS}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
seed AS (SELECT MIN(doc_a) AS id FROM pairs),
reach(id, d) AS (
  SELECT id, 0 FROM seed
  UNION ALL
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.d < {_REACH_DEPTH}
)
SELECT id AS doc_id, CAST(MIN(d) AS INTEGER) AS dist
FROM reach GROUP BY id
""",
    tags=("llm", "dedup", "graph", "sql"),
)
def q_graph_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distance (≤3 hops) from the lowest-id document in the LSH
    collision graph, written as a SQL ``WITH RECURSIVE`` CTE — Spark 4's
    recursive-query support, exercised against DuckDB's identical
    recursive semantics.

    The neighborhood a dedup reviewer walks outward from a seed document:
    how far does this near-dup family extend? The recursion is
    depth-bounded (each recursive step is one edge-list hash join against
    the frontier), and the final MIN(d) aggregate collapses path
    multiplicity into BFS distance. At 100 TB the frontier join is
    collision-sized per step; unbounded recursion would instead use the
    q_dedup_clusters fixpoint loop with its active-vertex pruning.
    """
    from streaming_data_ingestion_spark.caching import bounded_persist

    # Persist the collision-bounded pair set: the recursive CTE below
    # re-evaluates `edges` (and the seed) on every BFS level, and
    # without the persist each evaluation re-ran the full MinHash
    # signature + band self-join (~depth+2 corpus passes → 1).
    pairs = bounded_persist(
        "q_graph_reach.pairs",
        sf_dir,
        lambda: _lsh_candidate_pairs(spark, sf_dir),
    )
    pairs.createOrReplaceTempView("__reach_pairs")
    return spark.sql(f"""
WITH RECURSIVE edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM __reach_pairs
  UNION ALL SELECT doc_b, doc_a FROM __reach_pairs
),
seed AS (SELECT MIN(doc_a) AS id FROM __reach_pairs),
reach(id, d) AS (
  SELECT id, 0 FROM seed
  UNION ALL
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.d < {_REACH_DEPTH}
)
SELECT id AS doc_id, CAST(MIN(d) AS INT) AS dist
FROM reach GROUP BY id
""")


# --------------------------------------------------------------------------
# q_minhash_containment — asymmetric containment verify on LSH candidates.
# --------------------------------------------------------------------------


@query(
    "q_minhash_containment",
    oracle=f"""
WITH pairs AS ({_SQL_PAIRS}),
toks AS (
  SELECT doc_id, list_distinct({_SQL_TOKENS}) AS ts
  FROM documents
)
SELECT
  p.doc_a,
  p.doc_b,
  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts)
    AS cont_a_in_b,
  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(b.ts)
    AS cont_b_in_a,
  CASE WHEN CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts)
            >= CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(b.ts)
       THEN 'a_in_b' ELSE 'b_in_a' END AS direction
FROM pairs p
JOIN toks a ON p.doc_a = a.doc_id
JOIN toks b ON p.doc_b = b.doc_id
WHERE greatest(
  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(a.ts),
  CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) / len(b.ts)
) >= 0.7
""",
    tags=("llm", "dedup", "lsh"),
)
def q_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment verify over the LSH collision set: keep
    pairs where one document's distinct-token set is ≥ 70% inside the
    other's, with the containing direction.

    Jaccard (q_dedup_ngram_jaccard) is symmetric and misses the
    sub-document case — a short doc quoted wholesale inside a long one
    scores low Jaccard but containment ≈ 1 (Broder's original
    containment measure; the signal boilerplate/quote detection needs).
    Same scale shape as the Jaccard verify: candidate scope is the
    band-collision output (collision-sized, never n²), two doc_id equi
    hash joins bring the token sets, the set arithmetic is row-local.
    """
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_tokens()).alias("ts")
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b"))).cast(
        "double"
    )
    cont_a = inter / F.size("ts_a")
    cont_b = inter / F.size("ts_b")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            cont_a.alias("cont_a_in_b"),
            cont_b.alias("cont_b_in_a"),
            F.when(cont_a >= cont_b, F.lit("a_in_b"))
            .otherwise(F.lit("b_in_a"))
            .alias("direction"),
        )
        .filter(F.greatest(F.col("cont_a_in_b"), F.col("cont_b_in_a")) >= 0.7)
    )


# --------------------------------------------------------------------------
# q_dedup_agreement — cross-method candidate agreement: MinHash-LSH
# collisions vs winnowing shared-fingerprint pairs, two INDEPENDENT
# near-dup detectors over the same corpus. The self-evaluation a dedup
# pipeline runs when there is no labeled truth: method disagreement is
# where the thresholds need attention.
# --------------------------------------------------------------------------


@query(
    "q_dedup_agreement",
    oracle=f"""
WITH lsh AS ({_SQL_PAIRS}),
toks AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), t -> t != '') AS t
  FROM documents
  WHERE len(list_filter(str_split(trim(text), ' '), t -> t != '')) >= 8
),
gh AS (
  SELECT doc_id,
         list_transform(
           list_transform(
             range(1, len(t) - 4 + 1),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])),
           g -> ('0x' || substring(md5(g), 1, 8))::BIGINT) AS h
  FROM toks
),
sel AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(h) - 3 + 1),
           i -> least(h[i], h[i+1], h[i+2], h[i+3]))) AS fps
  FROM gh
),
post AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
win AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM post a JOIN post b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= 2
),
m AS (
  SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM lsh) AS n_lsh,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM win) AS n_winnow,
    (SELECT CAST(COUNT(*) AS BIGINT)
     FROM lsh JOIN win ON lsh.doc_a = win.doc_a AND lsh.doc_b = win.doc_b)
      AS n_both
)
SELECT
  n_lsh, n_winnow, n_both,
  CAST(n_both AS DOUBLE) / CAST(n_winnow AS DOUBLE) AS winnow_covered_by_lsh,
  CAST(n_both AS DOUBLE) / CAST(n_lsh AS DOUBLE) AS lsh_confirmed_by_winnow
FROM m
""",
    tags=("llm", "dedup", "eval"),
)
def q_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement between the two independent near-dup candidate
    generators: MinHash-LSH band collisions (whole-document set
    similarity) and winnowing pairs with >= 2 shared fingerprints
    (localized >= 8-token runs). With no labeled duplicates, method
    cross-coverage IS the quality readout: winnow pairs the LSH misses
    are sub-document overlaps below the Jaccard bands' sensitivity;
    LSH pairs winnowing doesn't confirm share vocabulary but no
    contiguous run.

    Scale shape: both pair sets are the already-bounded candidate
    machineries (band-hash equi-join; fingerprint postings equi-join —
    never n²); the intersection is one more equi hash join on the pair
    key, and the output is a single row of BIGINTs with two final IEEE
    divisions.
    """
    from streaming_data_ingestion_spark.queries.llm_text import (
        _winnow_postings,
    )

    from streaming_data_ingestion_spark.caching import bounded_persist

    # Persist both candidate pair sets (collision-bounded, never n²):
    # each is consumed twice (its own count + the intersection), and
    # without the persists the full MinHash-signature band join and the
    # winnowing postings self-join each ran twice (~7 corpus scans).
    lsh = bounded_persist(
        "q_dedup_agreement.lsh",
        sf_dir,
        lambda: _lsh_candidate_pairs(spark, sf_dir),
    )

    def _win() -> DataFrame:
        post = _winnow_postings(spark, sf_dir)
        a, b = post.alias("a"), post.alias("b")
        return (
            a.join(
                b,
                (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("ns"))
            .where(F.col("ns") >= 2)
            .select("doc_a", "doc_b")
        )

    win = bounded_persist("q_dedup_agreement.win", sf_dir, _win)
    n_lsh = lsh.agg(F.count(F.lit(1)).cast("long").alias("n_lsh"))
    n_win = win.agg(F.count(F.lit(1)).cast("long").alias("n_winnow"))
    n_both = lsh.join(win, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    return (
        n_lsh.crossJoin(F.broadcast(n_win))
        .crossJoin(F.broadcast(n_both))
        .select(
            "n_lsh",
            "n_winnow",
            "n_both",
            (F.col("n_both").cast("double") / F.col("n_winnow").cast("double")).alias(
                "winnow_covered_by_lsh"
            ),
            (F.col("n_both").cast("double") / F.col("n_lsh").cast("double")).alias(
                "lsh_confirmed_by_winnow"
            ),
        )
    )


# --------------------------------------------------------------------------
# q_jaccard_hist — exact-Jaccard histogram over the LSH candidate pairs:
# the text-side threshold-calibration readout (q_sim_pair_hist's twin for
# the token domain — is 0.5 the right verify cut?).
# --------------------------------------------------------------------------


@query(
    "q_jaccard_hist",
    oracle=f"""
WITH pairs AS ({_SQL_PAIRS}),
toks AS (
  SELECT doc_id, list_distinct({_SQL_TOKENS}) AS ts FROM documents
),
j AS (
  SELECT
    CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
      / len(list_distinct(list_concat(a.ts, b.ts))) AS jac
  FROM pairs p
  JOIN toks a ON p.doc_a = a.doc_id
  JOIN toks b ON p.doc_b = b.doc_id
)
SELECT
  CAST(LEAST(FLOOR(jac * 20.0), 19.0) AS INTEGER) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM j
GROUP BY bin
ORDER BY bin
""",
    tags=("llm", "dedup", "eval"),
)
def q_jaccard_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram (20 bins of width 0.05) of the exact distinct-token
    Jaccard over the LSH collision pairs — the calibration behind
    q_dedup_ngram_jaccard's 0.5 verify cut, exactly as q_sim_pair_hist
    calibrates the embedding near-dup threshold: a healthy LSH band
    config shows a valley between the collision noise floor and the
    true near-dup mass.

    Scale shape: identical to the verify stage it calibrates — the
    candidate scope is the band-collision set (never n²), token sets
    join back with two doc_id equi hash joins, and the output is a
    constant 20 rows. The Jaccard is one division of exact set sizes
    (array_intersect/union are order-insensitive), and the bin edges
    are one multiply + floor of that identical double in both engines.
    """
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(_tokens()).alias("ts")
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    jac = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b"))).cast(
        "double"
    ) / F.size(F.array_union(F.col("ts_a"), F.col("ts_b")))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least(F.floor(jac * F.lit(20.0)), F.lit(19.0))
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# q_lsh_tuning — candidate volume vs similarity threshold across every
# (bands × rows) factorization of the 12-permutation signature.
# --------------------------------------------------------------------------

# every (b, r) with b·r = 12; threshold ≈ (1/b)^(1/r) precomputed in
# python and inlined as the SAME literal in both engines (no runtime
# transcendental to diverge)
_LSH_CONFIGS = tuple(
    (b, 12 // b, round((1.0 / b) ** (1.0 / (12 // b)), 6))
    for b in (2, 3, 4, 6)
)


def _lsh_tuning_oracle() -> str:
    parts = []
    for b, r, thr in _LSH_CONFIGS:
        bands = "\n    UNION ALL\n".join(
            "    SELECT doc_id, "
            f"md5(concat_ws('|', {', '.join(f'mh{r * i + k}' for k in range(r))})) "
            f"AS bh, {i} AS bi FROM sigs"
            for i in range(b)
        )
        parts.append(f"""
SELECT {b} AS bands, {r} AS rows_per_band,
       CAST({thr} AS DOUBLE) AS threshold_est,
       CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs
FROM (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS c
  FROM (
{bands}
  ) x JOIN (
{bands}
  ) y ON y.bh = x.bh AND y.bi = x.bi AND y.doc_id > x.doc_id
)""")
    from streaming_data_ingestion_spark.queries.llm_dedup import _SQL_SIGS

    return _SQL_SIGS + "\nUNION ALL\n".join(parts) + "\nORDER BY bands"


@query(
    "q_lsh_tuning",
    oracle=_lsh_tuning_oracle(),
    tags=("llm", "dedup", "lsh"),
)
def q_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH operating curve: for EVERY (bands × rows-per-band)
    factorization of the same 12-permutation signature, the similarity
    threshold it targets (≈ (1/b)^(1/r), where the collision probability
    curve inflects) and the candidate-pair volume it actually produces
    on this corpus — the table an engineer reads to pick the
    recall/cost point before committing an index build (more bands =
    lower threshold = more candidates; q_dedup_minhash ships the (3, 4)
    row; q_jaccard_hist calibrates its verify cut).

    Scale shape: signatures are computed ONCE (the bounded-persisted
    12-minhash relation — one md5 per shingle, map-side minima); each
    config re-bands those 12 longs ROW-SIDE (b struct folds, zero extra
    shuffles) and counts distinct colliding pairs through the same
    band-keyed equi self-join as q_dedup_minhash_pairs — always
    collision-scoped, never all-pairs. Thresholds are python-precomputed
    literals, so the only measured quantities are exact BIGINT counts.
    """
    sigs = _bounded_persist(
        "q_lsh_tuning.sigs", sf_dir, lambda: _minhash_sigs(spark, sf_dir)
    )
    outs = []
    for b, r, thr in _LSH_CONFIGS:
        bands = sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("bi"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    *[
                                        F.col(f"mh{r * i + k}")
                                        for k in range(r)
                                    ],
                                )
                            ).alias("bh"),
                        )
                        for i in range(b)
                    ]
                )
            ).alias("s"),
        ).select("doc_id", "s.bi", "s.bh")
        x = bands.alias("x")
        y = bands.alias("y")
        pairs = (
            x.join(
                y,
                (F.col("y.bh") == F.col("x.bh"))
                & (F.col("y.bi") == F.col("x.bi"))
                & (F.col("y.doc_id") > F.col("x.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("c")
            )
            .distinct()
        )
        outs.append(
            pairs.agg(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.lit(thr).cast("double").alias("threshold_est"),
                F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("bands")

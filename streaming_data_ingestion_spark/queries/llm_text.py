"""Text-analysis operators for LLM training-data pipelines (north-star
mandate, SURVEY.md §2B "LLM-data-pipeline operators").

All pure DataFrame expressions — tokenization via split, stats via
aggregates, fingerprints via md5 over shingle arrays built with
higher-order functions (no explode → no row blow-up; a 100 TB corpus
stays one row per document until the term-frequency query, which explodes
then immediately partial-aggregates map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_ingestion_spark.compat import davg, dsum, sql_davg, sql_dsum
from streaming_data_ingestion_spark.registry import query
from streaming_data_ingestion_spark.tables import load


def _tokens(col: str = "text") -> Column:
    """Whitespace tokens with empties dropped (text has trailing spaces)."""
    return F.filter(F.split(F.trim(F.col(col)), " "), lambda t: t != "")


_SQL_TOKENS = "list_filter(str_split(trim(text), ' '), t -> t != '')"


# --------------------------------------------------------------------------
# q_dedup_exact — exact dedup on normalized text.
# --------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
SELECT
  sha256(lower(trim(text))) AS digest,
  MIN(doc_id) AS keeper_doc_id,
  COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
    tags=("llm", "dedup"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group documents by sha256(normalized text), keep the
    smallest doc_id.

    Deterministic alternative to dropDuplicates (which keeps an arbitrary
    row). At scale this is one hash aggregate on a 64-hex-char key —
    the digest, not the document body, is what shuffles.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("digest", F.sha2(F.lower(F.trim(F.col("text"))), 256))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# q_text_stats — corpus statistics per (lang, source).
# --------------------------------------------------------------------------


@query(
    "q_text_stats",
    oracle=f"""
SELECT
  lang,
  source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  {sql_davg(f"len({_SQL_TOKENS})", "avg_tokens")},
  {sql_davg("length(text)", "avg_len")},
  CAST(MAX(len({_SQL_TOKENS})) AS INTEGER) AS max_tokens
FROM documents
GROUP BY lang, source
""",
    tags=("llm", "text"),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char statistics per (lang, source) slice of the corpus."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        davg(n_tokens.cast("double"), "avg_tokens"),
        davg(F.length("text").cast("double"), "avg_len"),
        F.max(n_tokens).alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# q_text_tf — term frequency / top terms.
# --------------------------------------------------------------------------


@query(
    "q_text_tf",
    oracle=f"""
SELECT term, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents)
GROUP BY term
ORDER BY freq DESC, term ASC
LIMIT 50
""",
    tags=("llm", "text"),
)
def q_text_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 terms by frequency with document frequency.

    explode → groupBy(term): the partial aggregate runs map-side before
    the shuffle, so the shuffled volume is |vocabulary| per partition,
    not |tokens| — the only explode-based query shape that scales.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(50)
    )


# --------------------------------------------------------------------------
# q_token_count — whitespace + regex ("BPE-ish") token counting.
# --------------------------------------------------------------------------


@query(
    "q_token_count",
    oracle=f"""
SELECT
  doc_id,
  CAST(len({_SQL_TOKENS}) AS INTEGER) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_re_tokens,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bytes_per4
FROM documents
""",
    tags=("llm", "text"),
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, a BPE-ish regex
    (letter-runs / digit-runs / other), and the bytes/4 heuristic."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("n_re_tokens"),
        F.ceil(F.length("text") / 4.0).alias("n_bytes_per4"),
    )


# --------------------------------------------------------------------------
# q_quality_score — heuristic document quality scoring.
# --------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")
_SQL_STOPWORDS = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'for']"


@query(
    "q_quality_score",
    oracle=f"""
SELECT
  doc_id,
  n_tokens,
  stop_ratio,
  avg_token_len,
  CASE WHEN n_tokens >= 20 AND stop_ratio >= 0.05 THEN 'keep'
       WHEN n_tokens >= 5 THEN 'review'
       ELSE 'drop' END AS verdict
FROM (
  SELECT
    doc_id,
    CAST(len({_SQL_TOKENS}) AS INTEGER) AS n_tokens,
    CAST(len(list_filter({_SQL_TOKENS},
         t -> list_contains({_SQL_STOPWORDS}, t))) AS DOUBLE)
      / len({_SQL_TOKENS}) AS stop_ratio,
    CAST(length(replace(text, ' ', '')) AS DOUBLE)
      / len({_SQL_TOKENS}) AS avg_token_len
  FROM documents
)
""",
    tags=("llm", "text"),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: token count, stopword ratio, average token
    length, and a keep/review/drop verdict — the classic pre-training
    corpus filter, all in codegen'd expressions."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = n_stop.cast("double") / n_tokens
    avg_token_len = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n_tokens
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        avg_token_len.alias("avg_token_len"),
        F.when((n_tokens >= 20) & (stop_ratio >= 0.05), "keep")
        .when(n_tokens >= 5, "review")
        .otherwise("drop")
        .alias("verdict"),
    )


# --------------------------------------------------------------------------
# q_lang_id — n-gram/stopword-heuristic language ID.
# --------------------------------------------------------------------------


@query(
    "q_lang_id",
    oracle=f"""
SELECT
  doc_id,
  lang AS labeled_lang,
  en_ratio,
  CASE WHEN en_ratio >= 0.08 THEN 'en' ELSE 'und' END AS predicted_lang
FROM (
  SELECT
    doc_id,
    lang,
    CAST(len(list_filter({_SQL_TOKENS},
         t -> list_contains({_SQL_STOPWORDS}, t))) AS DOUBLE)
      / len({_SQL_TOKENS}) AS en_ratio
  FROM documents
)
""",
    tags=("llm", "text"),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: English-stopword density → en/und.

    (The fixture corpus draws every lang from one vocabulary, so this
    demonstrates the operator shape — marker-token density scoring —
    rather than a production classifier, which would extend the marker
    lists per language.)
    """
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    en_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
        / F.size(toks)
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        en_ratio.alias("en_ratio"),
        F.when(en_ratio >= 0.08, "en").otherwise("und").alias("predicted_lang"),
    )


# --------------------------------------------------------------------------
# q_fingerprint — document fingerprint: min-hash over word 3-gram shingles.
# --------------------------------------------------------------------------


@query(
    "q_fingerprint",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
)
SELECT
  doc_id,
  list_min(list_transform(
    range(1, greatest(len(t) - 1, 1)),
    i -> md5(concat_ws(' ', t[i], t[i+1], t[i+2]))
  )) AS fingerprint
FROM toks
""",
    tags=("llm", "dedup"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-permutation min-hash fingerprint over word 3-gram shingles.

    Built entirely with higher-order array functions (sequence →
    transform → array_min): no explode, one row in/out per document,
    md5 available identically in both engines. Documents sharing a
    fingerprint are near-dup candidates (q_dedup_minhash generalizes
    this to a banded signature).
    """
    from streaming_data_ingestion_spark.queries.llm_dedup import _shingles

    d = load(spark, sf_dir, "documents")
    # Shingles via zip-of-slices (see llm_dedup._shingles): O(tokens) per
    # row, vs O(tokens²) for transform(sequence, i -> element_at(t, i)).
    shingle_hashes = F.transform(_shingles(_tokens()), lambda s: F.md5(s))
    return d.select("doc_id", F.array_min(shingle_hashes).alias("fingerprint"))


# --------------------------------------------------------------------------
# q_fingerprint_rolling — polynomial rolling hash over the token stream.
# --------------------------------------------------------------------------

_RB = 1000003  # polynomial base (fits: acc < P < 2^32, acc*B < 2^52)
_RP = 4294967291  # largest prime < 2^32


@query(
    "q_fingerprint_rolling",
    oracle=f"""
SELECT
  doc_id,
  list_reduce(
    list_prepend(
      CAST(0 AS BIGINT),
      list_transform({_SQL_TOKENS},
                     t -> ('0x' || substring(md5(t), 1, 8))::BIGINT)
    ),
    (acc, x) -> (acc * {_RB} + x) % {_RP}
  ) AS fingerprint
FROM documents
""",
    tags=("llm", "dedup"),
)
def q_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: Rabin-Karp-style polynomial
    rolling hash over the token stream, h = Σ tok_i · B^(n-i) mod P.

    Complements q_fingerprint (min-hash: order-insensitive, robust to
    shuffling) — the rolling hash detects exact sequence duplicates and
    is the primitive a chunk-level incremental dedup would slide over.
    Per-token hashing reuses the md5-prefix→int trick (bit-identical in
    both engines); the fold is sequential long arithmetic with all
    intermediates < 2^52, so no overflow anywhere. One projection, no
    shuffle, no UDF.
    """
    d = load(spark, sf_dir, "documents")
    tok_hash = F.transform(
        _tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    rolled = F.aggregate(
        tok_hash,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _RB + x) % _RP,
    )
    return d.select("doc_id", rolled.alias("fingerprint"))


# --------------------------------------------------------------------------
# q_ngrams — token bigram counts (LM-style n-gram statistics).
# --------------------------------------------------------------------------


# Bigrams via the same zip-of-slices trick as the dedup shingles: the token
# array is evaluated twice per row total, not per element (see
# llm_dedup._shingles for why transform(sequence, ...) is O(tokens²) here).
def _bigrams(t: Column) -> Column:
    m = F.greatest(F.size(t) - 1, F.lit(1))
    z = F.arrays_zip(F.slice(t, 1, m), F.slice(t, 2, m))
    return F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"]))


_SQL_BIGRAMS = f"""
list_transform(
  range(1, greatest(len({_SQL_TOKENS}), 2)),
  i -> concat_ws(' ', {_SQL_TOKENS}[i], {_SQL_TOKENS}[i+1])
)
"""


@query(
    "q_ngrams",
    oracle=f"""
SELECT bigram, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({_SQL_BIGRAMS}) AS bigram FROM documents)
GROUP BY bigram
ORDER BY freq DESC, bigram ASC
LIMIT 100
""",
    tags=("llm", "text"),
)
def q_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 token bigrams with corpus and document frequency.

    The n-gram arrays are built per-row with higher-order functions (no
    shuffle), then one explode → groupBy with map-side partial
    aggregation: the shuffled volume is |bigram vocabulary| per
    partition, not the bigram stream. (freq, bigram) is a total order,
    so the LIMIT boundary is deterministic cross-engine.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_bigrams(_tokens())).alias("bigram"))
        .groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("freq").desc(), F.col("bigram").asc())
        .limit(100)
    )


# --------------------------------------------------------------------------
# q_inverted_index — term → sorted posting list of containing documents.
# --------------------------------------------------------------------------


@query(
    "q_inverted_index",
    oracle=f"""
SELECT
  term,
  CAST(COUNT(*) AS BIGINT) AS df,
  array_to_string((list_sort(list(doc_id)))[1:100], ',') AS postings
FROM (SELECT doc_id, unnest(list_distinct({_SQL_TOKENS})) AS term
      FROM documents)
GROUP BY term
""",
    tags=("llm", "text"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: per term, document frequency + a sorted, capped
    posting list.

    Per-document distinct terms are computed row-side (array_distinct —
    no shuffle), so the exploded stream carries each (doc, term) once;
    the groupBy then partial-aggregates map-side. Posting lists are
    sorted for determinism and capped at 100 entries — at corpus scale
    an uncapped list for a stopword-grade term would be a single
    giant row (the classic inverted-index skew), so the cap is the
    scale-safety valve while ``df`` keeps the true frequency.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", F.explode(F.array_distinct(_tokens())).alias("term")
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 100), ","
            ).alias("postings"),
        )
    )

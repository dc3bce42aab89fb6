"""Feature-hashing text embeddings: documents → the engine's ANN space.

The hashing trick (Weinberger et al. 2009) turns raw text into a
fixed-dimension vector with NO trained model and NO vocabulary state:
each token hashes to a bucket with a ±1 sign hash, the signed counts
accumulate, and the vector L2-normalizes. Model-free means fully
deterministic and embarrassingly parallel — the embedding is a pure
row-local expression (one crc32 per token, two array folds per row),
whole-stage-codegen'd, zero shuffle, no Python.

Why it earns a place beside the real model embeddings: dimension is
chosen to match the embeddings table (64), so raw documents ride the
ENTIRE existing similarity stack unchanged — brute-force cosine,
hyperplane LSH, IVF, and the stored IVFPQ index (tested end-to-end) —
before any model inference has run. That is the bootstrap a curation
pipeline needs on day zero of a new corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def text_embed_expr(text_col: str = "text", dim: int = 64) -> Column:
    """L2-normalized signed-hash embedding of whitespace tokens,
    computed entirely row-side."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), " "), lambda t: t != ""
    )
    # hash each token ONCE: (bucket, sign); the per-dimension folds then
    # scan the precomputed structs instead of re-hashing
    hashed = F.transform(
        toks,
        lambda t: F.struct(
            (F.crc32(t.cast("binary")) % dim).cast("int").alias("b"),
            F.when(
                F.crc32(F.concat(t, F.lit("#")).cast("binary")) % 2 == 0,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("s"),
        ),
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            F.filter(hashed, lambda h: h["b"] == i),
            F.lit(0.0),
            lambda acc, h: acc + h["s"],
        ),
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(norm > 0, F.transform(raw, lambda x: x / norm)).otherwise(
        raw
    )


def docs_to_embeddings(
    docs: DataFrame, dim: int = 64, text_col: str = "text"
) -> DataFrame:
    """(doc_id, text, …) → (vec_id, embedding float[dim]) — schema-
    compatible with the embeddings table, so every registered
    similarity operator accepts the output directly.

    Persist the result before ITERATIVE consumers (k-means, PQ): their
    plans reference the embedding column once per centroid/subspace
    term, and an unpersisted lazy embed expression would be inlined
    into every reference (codegen explosion). One-pass consumers can
    stay lazy."""
    return docs.select(
        F.col("doc_id").alias("vec_id"),
        text_embed_expr(text_col, dim).cast("array<float>").alias("embedding"),
    )

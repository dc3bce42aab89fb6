"""Feature-hashing embeddings: geometry invariants, discrimination, and
compatibility with the full ANN stack."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.text_embed import docs_to_embeddings
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


def _cos(a, b):
    return float(np.dot(a, b))


def test_unit_norm_deterministic_and_plan_narrow(spark):
    docs = load(spark, SF_DIR, "documents").limit(100)
    emb = docs_to_embeddings(docs)
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    assert len(rows) == 100
    for v in rows.values():
        assert len(v) == 64
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    # deterministic across runs
    rows2 = {
        r["vec_id"]: list(r["embedding"]) for r in emb.collect()
    }
    assert rows == rows2
    # zero-shuffle: the embedding is a pure projection
    plan = (
        emb._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_identical_texts_embed_identically_and_discriminate(spark):
    docs = load(spark, SF_DIR, "documents")
    emb = {r["vec_id"]: np.array(r["embedding"]) for r in
           docs_to_embeddings(docs.limit(200)).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.limit(200).collect()}

    # exact duplicate text → exact duplicate vector (cosine 1)
    d0 = list(texts)[0]
    dup = docs.limit(200).filter(F.col("doc_id") == d0).withColumn(
        "doc_id", F.lit(10_000_000)
    )
    dup_vec = np.array(
        docs_to_embeddings(dup).collect()[0]["embedding"]
    )
    assert _cos(emb[d0], dup_vec) > 1 - 1e-6

    # a doc is more similar to itself than to the average other doc
    ids = list(emb)
    self_sim = 1.0
    cross = np.mean([_cos(emb[ids[0]], emb[j]) for j in ids[1:50]])
    assert self_sim > cross + 0.05


def test_hash_embeddings_ride_the_ivfpq_index(spark, tmp_path):
    """Day-zero similarity: raw documents → hash embeddings → the SAME
    stored IVFPQ index and partition-pruned query path the model
    embeddings use; the query document is its own top hit."""
    from streaming_data_ingestion_spark.ml.ivfpq import (
        build_ivfpq_index,
        query_ivfpq,
    )

    docs = load(spark, SF_DIR, "documents").limit(150)
    # persist: k-means/PQ reference the embedding column many times per
    # plan; an unpersisted lazy embed expression would be duplicated
    # into every centroid-distance term (codegen explosion)
    emb = docs_to_embeddings(docs).persist()
    emb.count()
    path = str(tmp_path / "text_ivfpq")
    cents = build_ivfpq_index(emb, path, k_cells=4, n_iters=2)
    probe = emb.limit(1).collect()[0]
    hits = query_ivfpq(
        spark, path, cents, [float(x) for x in probe["embedding"]],
        nprobe=2, k=5,
    ).collect()
    assert len(hits) == 5
    assert hits[0]["exact_dist"] < 1e-9
    emb.unpersist()


def test_cluster_balanced_corpus_sampling(spark):
    """Composition the curation pipeline runs for mixture balancing:
    hash embeddings → k-means cells → per-cluster hash-deterministic
    downsample to the smallest cluster's size (SemDeDup-adjacent
    cluster balancing, no model required). Asserts real multi-cluster
    structure, deterministic sample membership, and per-cluster caps."""
    from streaming_data_ingestion_spark.ml.kmeans import (
        assign_cells,
        kmeans_fit,
    )

    docs = load(spark, SF_DIR, "documents")
    # persist for the same codegen-explosion reason as the IVFPQ test
    emb = docs_to_embeddings(docs).persist()
    emb.count()
    cents, _ = kmeans_fit(emb, k=4, n_iters=2)
    assigned = assign_cells(emb, cents).select("vec_id", "cell")

    sizes = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert len(sizes) >= 2, "hash embeddings must separate the corpus"
    cap = min(sizes.values())

    # deterministic per-cluster top-`cap` by md5(vec_id): reproducible
    # on any partitioning (the q_sample_topk_hash idiom, per cluster)
    from pyspark.sql import Window

    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string").cast("binary")), F.col("vec_id")
    )
    balanced = assigned.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= cap
    )
    got = {
        r["cell"]: r["n"]
        for r in balanced.groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert all(n == cap for n in got.values())
    # determinism: same sample membership on a re-run
    ids1 = sorted(r["vec_id"] for r in balanced.collect())
    ids2 = sorted(r["vec_id"] for r in balanced.collect())
    assert ids1 == ids2
    emb.unpersist()

"""IVFPQ index: build → partition-pruned probe → ADC → exact re-rank.

Pins the three claims docs/SCALE.md makes about the ANN layout: the
index is physically partitioned by cell, the probe is partition pruning
(not a post-scan filter), and the query path converges to exact
brute-force when probing everything with full re-rank.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.ml.ivfpq import (
    _adc_table,
    build_ivfpq_index,
    query_ivfpq,
)
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR

K_CELLS = 4


def _build(spark, tmp_path):
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivfpq")
    cents = build_ivfpq_index(emb, path, k_cells=K_CELLS, n_iters=2)
    return emb, path, cents


def test_index_layout_and_probe_pruning(spark, tmp_path):
    emb, path, cents = _build(spark, tmp_path)
    # physically partitioned by cell
    cells = sorted(p.name for p in (tmp_path / "ivfpq").glob("cell=*"))
    assert len(cells) >= 2  # k-means found multiple populated cells
    # every vector indexed exactly once, codes are 8 small ints
    idx = spark.read.parquet(path)
    assert idx.count() == emb.count()
    row = idx.first()
    assert len(row["codes"]) == 8
    # the probe scan must prune partitions, not filter after reading
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    res_df = query_ivfpq(spark, path, cents, list(q), nprobe=1, k=3)
    plan = res_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters: [" in plan
    assert "cell#" in plan.split("PartitionFilters:")[1].split("\n")[0]


def test_full_probe_full_rerank_equals_brute_force(spark, tmp_path):
    """nprobe = all cells + rerank = corpus ⇒ IVFPQ must return exactly
    the brute-force L2 top-k (the approximation comes ONLY from pruning
    and ADC ordering, both disabled here)."""
    emb, path, cents = _build(spark, tmp_path)
    n = emb.count()
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]

    got = query_ivfpq(
        spark, path, cents, list(q), nprobe=K_CELLS, k=5, rerank=n
    ).collect()

    q_arr = F.array(*[F.lit(float(x)) for x in q])
    exact = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            q_arr,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    want = (
        emb.select("vec_id", exact.alias("d"))
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    )
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    assert [r["exact_dist"] for r in got] == [r["d"] for r in want]
    # the query vector itself is in the corpus: it must rank first at 0
    assert got[0]["vec_id"] == 7 and got[0]["exact_dist"] == 0.0


def test_adc_table_matches_stored_error(spark, tmp_path):
    """A vector's ADC distance to ITSELF under its own codes must equal
    the stored quantization error sq_err — the identity linking the
    encode path and the query path."""
    emb, path, cents = _build(spark, tmp_path)
    idx = spark.read.parquet(path).filter(F.col("vec_id") < 10).collect()
    for row in idx:
        table = _adc_table(list(row["embedding"]))
        adc_self = 0.0
        for s, code in enumerate(row["codes"]):
            adc_self = adc_self + table[s][code]
        assert adc_self == row["sq_err"]


def test_probe_subset_is_cell_restricted(spark, tmp_path):
    """With nprobe=1 every result must come from the probed cell."""
    emb, path, cents = _build(spark, tmp_path)
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    from streaming_data_ingestion_spark.ml.ivfpq import _probe_cells

    probe = _probe_cells(list(q), cents, 1)
    got = query_ivfpq(spark, path, cents, list(q), nprobe=1, k=5).collect()
    assert got and all(r["cell"] == probe[0] for r in got)

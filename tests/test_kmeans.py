"""K-means trainer: Lloyd's invariants + determinism + index composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_ingestion_spark.ml.kmeans import assign_cells, kmeans_fit
from streaming_data_ingestion_spark.tables import load

from tests.conftest import SF_DIR


def test_kmeans_inertia_monotone_and_deterministic(spark):
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents, hist = kmeans_fit(emb, k=8, n_iters=4)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # Lloyd's: inertia never increases
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
    # clustering actually helped vs the seed assignment
    assert hist[-1] < hist[0]

    cents2, hist2 = kmeans_fit(emb, k=8, n_iters=4)
    assert cents == cents2  # bit-identical, any partitioning
    assert hist == hist2


def test_kmeans_assignment_partitions_corpus(spark):
    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents, _ = kmeans_fit(emb, k=4, n_iters=2)
    assigned = assign_cells(emb, cents)
    # total preserved, every vector in exactly one valid cell
    assert assigned.count() == emb.count()
    cells = [r["cell"] for r in assigned.select("cell").distinct().collect()]
    assert all(0 <= c < 4 for c in cells)
    # non-degenerate: more than one cell in use
    assert len(cells) >= 2
    # assignment is a narrow map: no shuffle in the plan
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = assigned._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan

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
    _probe_cells,
    adc_candidates,
    build_ivfpq_index,
    fetch_vectors,
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


def _fmt_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _read_schemas(plan: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "ReadSchema:" in ln]


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
    # the probe's ADC stage must prune partitions, not filter after
    # reading (query_ivfpq itself runs the stage eagerly, so the guard
    # inspects the stage plan the way the query builds it)
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    probes = _probe_cells(list(q), cents, 1)
    probed = spark.read.parquet(path).filter(F.col("cell").isin(*probes))
    stage = adc_candidates(probed, _adc_table(list(q)), 3)
    plan = _fmt_plan(spark, stage)
    assert "PartitionFilters: [" in plan
    assert "cell#" in plan.split("PartitionFilters:")[1].split("\n")[0]
    # ...and the end-to-end query result stays cell-restricted
    res = query_ivfpq(spark, path, cents, list(q), nprobe=1, k=3).collect()
    assert res and all(r["cell"] == probes[0] for r in res)


def test_adc_stage_reads_codes_only_fetch_pushes_vec_id(spark, tmp_path):
    """The two claims the r8 point-fetch restructure rests on, pinned at
    the plan level: (1) the ADC stage's parquet ReadSchema carries codes
    but NEVER the float `embedding` column (the probe reads ~3% of the
    vector bytes); (2) the re-rank fetch pushes the survivor vec_id
    IN-list into the reader (PushedFilters → row-group skipping) on top
    of cell partition pruning."""
    emb, path, cents = _build(spark, tmp_path)
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    probes = _probe_cells(list(q), cents, 2)
    probed = spark.read.parquet(path).filter(F.col("cell").isin(*probes))
    stage = adc_candidates(probed, _adc_table(list(q)), 5)
    schemas = _read_schemas(_fmt_plan(spark, stage))
    assert schemas, "ADC stage plan has no parquet scan"
    assert all("embedding" not in ln for ln in schemas), schemas
    assert any("codes" in ln for ln in schemas), schemas

    fplan = _fmt_plan(spark, fetch_vectors(spark, path, probes, [1, 7, 9]))
    pushed = fplan.split("PushedFilters:")[1].split("\n")[0]
    assert "In(vec_id" in pushed, pushed
    assert "PartitionFilters: [" in fplan
    assert "cell#" in fplan.split("PartitionFilters:")[1].split("\n")[0]


def test_lazy_fallback_matches_point_fetch_plan(spark, tmp_path, monkeypatch):
    """Past _COLLECT_RERANK_MAX the query must stay distributed (no
    driver materialization) and return EXACTLY what the point-fetch plan
    returns for the same parameters — forced here by dropping the bound
    to 0 and re-running the identical query."""
    import streaming_data_ingestion_spark.ml.ivfpq as ivfpq_mod

    emb, path, cents = _build(spark, tmp_path)
    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    want = query_ivfpq(
        spark, path, cents, list(q), nprobe=2, k=5, rerank=20
    ).collect()
    monkeypatch.setattr(ivfpq_mod, "_COLLECT_RERANK_MAX", 0)
    lazy_df = query_ivfpq(
        spark, path, cents, list(q), nprobe=2, k=5, rerank=20
    )
    # the lazy plan carries the whole pipeline: probed codes-scan + the
    # broadcast ADC cut; nothing was collected while building it
    plan = _fmt_plan(spark, lazy_df)
    assert "PartitionFilters: [" in plan
    assert lazy_df.collect() == want


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

    probe = _probe_cells(list(q), cents, 1)
    got = query_ivfpq(spark, path, cents, list(q), nprobe=1, k=5).collect()
    assert got and all(r["cell"] == probe[0] for r in got)


# --------------------------------------------------------------------------
# Registered-query stage guards. q_sim_ivfpq_recall / q_sim_ivfpq_probe_param
# run their ADC stage EAGERLY (bounded ≤ rerank collect), so the global
# plan sweeps in tests/test_plans.py can no longer observe the probe
# stage through the returned DataFrame — these tests inspect the stage
# frames directly (the _SWEEP_SKIP companion checks).
# --------------------------------------------------------------------------

_PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonUDTF",
)


def _assert_probe_stage_plan(plan: str) -> None:
    schemas = _read_schemas(plan)
    assert schemas, "stage plan has no parquet scan"
    assert all("embedding" not in ln for ln in schemas), schemas
    assert any("codes" in ln for ln in schemas), schemas
    assert "PartitionFilters: [" in plan
    assert "cell#" in plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not [m for m in _PY_MARKERS if m in plan]


def test_registered_recall_stage_is_codes_only(spark):
    """_det_recall_kept (the q_sim_ivfpq_recall ADC stage): the probed
    index scan reads (vec_id, cell, codes) — never the float column —
    behind a literal-IN PartitionFilter, with no cartesian and no Python
    in the stage plan."""
    from streaming_data_ingestion_spark.queries.llm_similarity import (
        _det_recall_kept,
    )

    kept, _path, cells = _det_recall_kept(spark, SF_DIR)
    assert len(cells) >= 1
    _assert_probe_stage_plan(_fmt_plan(spark, kept))

    from streaming_data_ingestion_spark.registry import all_queries

    final = all_queries()["q_sim_ivfpq_recall"].fn(spark, SF_DIR)
    # driver-canonicalizer safety for the skipped scalar-only sweep
    assert [f.dataType.simpleString() for f in final.schema.fields] == [
        "bigint", "bigint", "bigint", "double"
    ]


def test_registered_param_probe_stage_is_codes_only(spark):
    """_probe_adc_stage (the ivfpq_probe / q_sim_ivfpq_probe_param ADC
    stage): same codes-only + partition-pruned contract for the
    arbitrary-vector serving path, and the final assembled plan's
    re-rank fetch pushes the survivor vec_id IN-list into the reader."""
    from streaming_data_ingestion_spark.queries.llm_similarity import (
        _PARAM_Q,
        _probe_adc_stage,
        ivfpq_probe,
    )

    stage, _path, _cells = _probe_adc_stage(spark, SF_DIR, _PARAM_Q, 2, 20)
    _assert_probe_stage_plan(_fmt_plan(spark, stage))

    final = ivfpq_probe(spark, SF_DIR, _PARAM_Q)
    fplan = _fmt_plan(spark, final)
    pushed = fplan.split("PushedFilters:")[1].split("\n")[0]
    assert "In(vec_id" in pushed, pushed
    assert "cell#" in fplan.split("PartitionFilters:")[1].split("\n")[0]
    # driver-canonicalizer safety for the skipped scalar-only sweep
    assert [f.dataType.simpleString() for f in final.schema.fields] == [
        "int", "bigint", "bigint", "double", "double"
    ]

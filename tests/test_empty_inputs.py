"""Empty-input robustness: a representative query from every family must
run (not crash) against zero-row tables with the production schemas.

At 100 TB an empty slice is routine — a date partition with no data, a
source with every document filtered out — and an operator that throws on
it takes the whole pipeline run down. Each query here must return a
well-defined (usually empty; for global aggregates one-row) result.
"""

from __future__ import annotations

import pytest

from streaming_data_ingestion_spark.registry import all_queries
from streaming_data_ingestion_spark.tables import TABLES, load

from tests.conftest import SF_DIR

# One representative per family. Excluded by design: similarity queries
# that look up fixed query-vector ids (q_sim_topk et al. — an empty
# corpus has no query vector, which is a caller error, not a pipeline
# state) and the iterative graph ops whose seed selection requires rows.
EMPTY_SAFE = (
    "q_scan_project",
    "q_filter_compound",
    "q_agg_group",
    "q_agg_rollup",
    "q_agg_percentile",
    "q_win_rank",
    "q_win_topk_per_group",
    "q_subquery_exists",
    "q_join_multi",
    "q_join_asof",
    "q_sort_limit",
    "q_sessionize",
    "q_ewma",
    "q_markov_transitions",
    "q_rfm",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_minhash_pairs",
    "q_text_tf",
    "q_ngrams",
    "q_quality_gopher",
    "q_sample_stratified",
    "q_heavy_hitters_cms",
    "q_histogram_equidepth",
    "q_tpcds_rollup_rank",
    "q_tpcds_moving_dev",
    "q_tpcds_cumulative_lead",
    "q_tpch_q1",
    "q_emb_covariance",
    "q_join_asof_fwd",
    "q_zorder_scan",
    "q_pca2_project",
    "q_lm_score_bigram",
    "q_source_log_odds",
    "q_split_leakage_audit",
    "q_token_budget_pick",
    "q_kendall_tau",
    "q_theil_sen",
    "q_benford",
    "q_new_vs_returning",
    "q_dedup_yield",
    "q_dedup_suffix",
    "q_bm25_search",
    "q_mix_temperature",
    "q_pack_efficiency",
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load(spark, SF_DIR, t).limit(0).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    specs = all_queries()
    rows = specs[name].fn(spark, empty_sf_dir).collect()
    # empty input must produce a well-defined result: either no rows, or
    # (for global aggregates) rows whose counts are zero/null
    for r in rows:
        d = r.asDict()
        for k, v in d.items():
            if k.startswith("n_") and v is not None:
                assert v == 0, (name, d)

"""SURVEY.md §2B ↔ registry sync.

§2B is the binding capability contract: every query key documented there
must be registered (with an oracle unless the row says rows-only), and
every registered query must be documented. A drift in either direction is
a broken promise, caught here instead of by the external audit.
"""

from __future__ import annotations

import re
from pathlib import Path

from streaming_data_ingestion_spark.registry import all_queries

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _survey_2b_keys() -> set[str]:
    text = SURVEY.read_text()
    start = text.index("### 2B.")
    end = text.index("\n## 3.")
    section = text[start:end]
    return set(re.findall(r"`(q_[a-z0-9_]+)`", section))


def test_survey_inventory_matches_registry():
    documented = _survey_2b_keys()
    registered = set(all_queries())
    missing_impl = documented - registered
    undocumented = registered - documented
    assert not missing_impl, f"in SURVEY §2B but not registered: {sorted(missing_impl)}"
    assert not undocumented, f"registered but absent from SURVEY §2B: {sorted(undocumented)}"


def test_oracle_coverage_is_near_total():
    """Rows-only entries are the contract's escape hatch for genuinely
    non-SQL-expressible ops; they must stay the rare exception."""
    specs = all_queries()
    rows_only = sorted(n for n, s in specs.items() if s.oracle is None)
    assert rows_only == [
        "q_agg_approx",          # HLL++ internals differ by design
        "q_bpe_encode",          # iterative greedy merge loop; pinned by
        #                          the pure-Python replay in test_bpe.py
        "q_multimodal_features", # Arrow mapInPandas decode path
        "q_sim_ivfpq_index",     # physical stored-index layout on disk
    ], rows_only


def test_prose_counters_match_registry():
    """SURVEY §8 / docs/API.md headline counts must track the registry.
    The §2B table is enforced above, but the PROSE counters drifted in
    rounds 5 and 6 ("260 oracle-checked" against a 268-oracled registry)
    — parse them here so that drift class dies."""
    specs = all_queries()
    n = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    n_rows_only = n - n_oracle

    text = SURVEY.read_text()
    s8 = text[text.index("## 8."):]
    m = re.search(r"(\d+) queries are registered", s8)
    assert m and int(m.group(1)) == n, (
        f"SURVEY §8 says {m and m.group(1)} registered, registry has {n}"
    )
    m = re.search(r"(\d+) oracle-checked against", s8)
    assert m and int(m.group(1)) == n_oracle, (
        f"SURVEY §8 says {m and m.group(1)} oracle-checked, "
        f"registry has {n_oracle}"
    )
    m = re.search(r"(\d+) rows-only by contract", s8)
    assert m and int(m.group(1)) == n_rows_only, (
        f"SURVEY §8 says {m and m.group(1)} rows-only, "
        f"registry has {n_rows_only}"
    )

    api = (SURVEY.parent / "docs" / "API.md").read_text()
    counts = re.findall(
        r"(\d+) registered query keys|all (\d+) operators", api
    )
    assert counts, "docs/API.md lost its headline counts"
    for a, b in counts:
        assert int(a or b) == n, (
            f"docs/API.md says {a or b} operators, registry has {n}"
        )


def test_bench_headline_is_registered():
    """Every bench.py HEADLINE name must be a registered query — a typo
    or stale entry would crash the driver's per-round benchmark."""
    import bench

    registered = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in registered]
    assert not missing, f"bench HEADLINE not in registry: {missing}"
    missing_tpch = [n for n in bench.TPCH if n not in registered]
    assert not missing_tpch, f"bench TPCH not in registry: {missing_tpch}"
    assert len(bench.TPCH) == 22
    missing_ext = [n for n in bench.EXTENDED if n not in registered]
    assert not missing_ext, f"bench EXTENDED not in registry: {missing_ext}"
    # no duplicates within or across groups (a dup double-counts a total)
    all_names = list(bench.HEADLINE) + list(bench.TPCH) + list(bench.EXTENDED)
    dupes = [n for n in set(all_names) if all_names.count(n) > 1]
    assert not dupes, f"bench groups overlap: {dupes}"

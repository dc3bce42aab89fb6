"""Guard on the re-verify guard (VERDICT r8 "Next round" #7).

Round 8 rewrote three green keys without stamping reverify_queue.json,
so the rotation kept certifying the old plans. These tests make that
impossible to repeat: every registered key's implementing source
(transitive: the function plus every package helper/constant it
reaches) is content-digested into registry_digests.json with the round
it last changed; an edit without running scripts/update_digests.py
fails here, and the updater itself stamps edited green keys into
reverify_queue.json so the driver re-certifies them next round.

Proof it works: seeding the baselines from the round-8 snapshot
(commit ee9aa75) surfaced 8 keys edited in round 9 that had NOT been
stamped (BM25/serving/zorder) — the exact failure mode, recurring,
caught mechanically.
"""

from __future__ import annotations

import inspect
import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "scripts"))

from keydigest import (  # noqa: E402
    all_key_digests,
    key_digest,
    last_green_rounds,
    load_digests,
    reachable_sources,
)


@pytest.fixture(scope="module")
def live():
    return all_key_digests()


@pytest.fixture(scope="module")
def stored():
    return load_digests()


def test_every_key_has_a_stored_digest(live, stored):
    missing = sorted(set(live) - set(stored))
    assert not missing, (
        f"keys with no digest baseline (run scripts/update_digests.py): "
        f"{missing}"
    )
    dropped = sorted(set(stored) - set(live))
    assert not dropped, (
        f"digest file has unregistered keys (run scripts/update_digests.py): "
        f"{dropped}"
    )


def test_digests_are_current(live, stored):
    """An edit anywhere in a key's reachable source (or its oracle, or a
    binding constant it references) MUST go through
    scripts/update_digests.py, which re-stamps the change round and the
    re-verify queue together."""
    drifted = sorted(
        k
        for k, d in live.items()
        if k in stored and stored[k].get("digest") != d
    )
    assert not drifted, (
        "implementing source changed without re-stamping — run "
        f"scripts/update_digests.py: {drifted}"
    )


def test_changed_green_keys_are_queued_for_reverify(stored):
    """The doctrine itself: a key whose source changed AFTER its last
    driver-green round holds a green that certifies the OLD definition;
    it must sit in reverify_queue.json at (at least) the change round so
    the rotation forces it into the next driver window. Keys never
    driver-checked are exempt — the rotation's never-checked bucket
    already windows them first."""
    from __spark_entry__ import _reverify_rounds

    greens = last_green_rounds()
    queue = _reverify_rounds()
    unstamped = sorted(
        k
        for k, ent in stored.items()
        if greens.get(k)
        and ent["round"] > greens[k]
        and queue.get(k, 0) < ent["round"]
    )
    assert not unstamped, (
        f"edited-after-green keys missing a re-verify stamp: {unstamped}"
    )


def test_digest_reaches_transitive_helpers_and_constants():
    """Pins the r8 scenario mechanics: the probe key's digest must cover
    the stage helpers that round 8 actually edited (which live OUTSIDE
    the registered function body) and the bound parameter vector (a
    module constant — semantics with no function source at all)."""
    from streaming_data_ingestion_spark.registry import all_queries

    fn = inspect.unwrap(all_queries()["q_sim_ivfpq_probe_param"].fn)
    reach = reachable_sources(fn)
    quals = {q for _, q in reach}
    for helper in ("_probe_adc_stage", "ivfpq_probe", "_adc_table"):
        assert helper in quals, f"{helper} not in digest reach: {sorted(quals)}"
    const_blobs = [
        src for (_, q), src in reach.items() if q.endswith("#consts")
    ]
    assert any("_PARAM_Q" in blob for blob in const_blobs), (
        "bound query vector _PARAM_Q not covered by the digest"
    )


def test_digest_reaches_function_local_imports():
    """House style defers package imports into function bodies to break
    cycles; those helpers are locals, invisible to co_names/globals —
    the digest must reach them through the AST import pass, or a whole
    maintainer rewrite (probe_generation) would never flag the keys
    built on it."""
    from streaming_data_ingestion_spark.registry import all_queries

    fn = inspect.unwrap(all_queries()["q_ann_gen_probe"].fn)
    quals = {q for _, q in reachable_sources(fn)}
    for helper in (
        "probe_generation",   # imported inside q_ann_gen_probe
        "bootstrap_index",    # imported inside _gen_index_for
        "kmeans_fit",         # imported inside bootstrap_index
        "serve_topk",         # imported inside probe_generation
        "adc_candidates",     # named inside serve_topk
    ):
        assert helper in quals, f"{helper} not reached: {sorted(quals)}"


def test_digest_is_sensitive_to_oracle_and_fn(live):
    """key_digest must move when the oracle SQL moves (same fn)."""
    from streaming_data_ingestion_spark.registry import all_queries

    spec = all_queries()["q_agg_group"]

    class Tweaked:
        fn = spec.fn
        oracle = (spec.oracle or "") + " -- changed"

    assert key_digest(Tweaked) != live["q_agg_group"]


def test_green_predicate_agrees_with_rotation():
    """keydigest.last_green_rounds re-implements the satisfied-row
    predicate the window rotation uses (__spark_entry__._satisfied);
    if the two ever disagree on a recorded row, the re-verify doctrine
    and the digest doctrine are enforcing different notions of 'green'.
    Replay every recorded CORRECTNESS row through both."""
    import glob
    import json
    import re

    from __spark_entry__ import _satisfied

    greens = last_green_rounds()
    replay: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rno = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for k, row in json.load(open(path)).items():
            if isinstance(row, dict) and _satisfied(row):
                replay[k] = max(replay.get(k, 0), rno)
    assert replay == greens


def test_same_round_edit_cannot_dodge_reverify():
    """ADVICE r9: an edit landing in the SAME round as the key's latest
    driver green must be recorded at green-round + 1 — digest round ==
    green round would make the queue stamp inert (the rotation only
    bites while last-green < stamp), letting a post-drive rewrite keep
    a green that certifies the OLD definition."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from update_digests import effective_change_round

    assert effective_change_round(10, 0) == 10   # never green: build round
    assert effective_change_round(10, 9) == 10   # earlier green: build round
    assert effective_change_round(10, 10) == 11  # same-round green: bumped
    # defensive: a green somehow AHEAD of the build round still bumps past it
    assert effective_change_round(10, 12) == 13

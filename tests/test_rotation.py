"""Driver-rotation invariants.

Round 3's verdict flagged that the CORRECTNESS rotation had gone stale:
the first-50 window of ``queries()`` was exactly the already-verified
set, so a driver round would have re-checked green keys while 78 keys
stayed unverified forever. These tests make that failure mode a test
failure instead of a judge finding.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _driver_checked() -> set[str]:
    """Keys with a SATISFIED driver row (green, or rows-only by contract).

    A key whose latest row errored (r04: q_pq_encode / q_emb_quantize)
    is NOT checked — it has no standing green result and legitimately
    occupies a window slot for re-verification, exactly like a
    never-checked key. Mirrors ``__spark_entry__._satisfied``.
    """
    keys: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for k, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                if row.get("spark_rows") is not None:
                    keys.add(k)
            elif (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            ):
                keys.add(k)
    return keys


def _entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_test", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotation_is_a_permutation_of_the_registry():
    from streaming_data_ingestion_spark.registry import all_queries

    mod = _entry()
    q = mod.queries()
    assert list(q) != []
    assert set(q) == set(all_queries())
    assert len(q) == len(all_queries())


def test_first_window_prefers_never_checked_keys():
    """As long as ANY registered key lacks a driver CORRECTNESS row, the
    first-50 window must not waste slots re-verifying green keys."""
    checked = _driver_checked()
    if not checked:  # fresh clone without driver artifacts
        return
    mod = _entry()
    keys = list(mod.queries())
    unchecked = [k for k in keys if k not in checked]
    if not unchecked:
        return  # full coverage reached — any order is fine
    window = keys[:50]
    wasted = [k for k in window if k in checked]
    # every wasted slot must mean there were no unchecked keys left over
    n_unchecked_outside = len([k for k in unchecked if k not in window])
    assert not (wasted and n_unchecked_outside), (
        f"rotation stale: {len(wasted)} already-verified keys occupy the "
        f"driver window while {n_unchecked_outside} unchecked keys wait "
        f"outside; lead with e.g. {unchecked[:5]}"
    )


def test_backlog_keys_outrank_new_keys_in_the_window():
    """Never-checked keys registered in an EARLIER round (per the
    ledger) must occupy window slots before keys registered later —
    otherwise each round's alphabetically-early new keys displace the
    previous round's still-waiting ones and the backlog never drains."""
    mod = _entry()
    checked = _driver_checked()
    keys = list(mod.queries())
    ledger = mod._waiting_rounds()
    window = set(keys[:50])
    unchecked = [k for k in keys if k not in checked]
    inside = [k for k in unchecked if k in window]
    outside = [k for k in unchecked if k not in window]
    if not outside:
        return  # everything unchecked fits — nothing to displace
    worst_inside = max(ledger.get(k, 10**9) for k in inside)
    best_outside = min(ledger.get(k, 10**9) for k in outside)
    assert best_outside >= worst_inside, (
        "an earlier-registered unchecked key waits OUTSIDE the window "
        "while a later-registered one sits inside: "
        f"outside round {best_outside} vs inside round {worst_inside}"
    )


def test_ledger_covers_the_registry():
    """Every registered key must carry a registration-round stamp —
    run scripts/update_ledger.py after registering new queries."""
    from streaming_data_ingestion_spark.registry import all_queries

    ledger = _entry()._waiting_rounds()
    missing = sorted(set(all_queries()) - set(ledger))
    stale = sorted(set(ledger) - set(all_queries()))
    assert not missing, f"unstamped keys {missing}: run scripts/update_ledger.py"
    assert not stale, f"ledger keys no longer registered {stale}: run scripts/update_ledger.py"


def test_every_oracle_belongs_to_a_registered_query():
    mod = _entry()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    # rows-only keys are the rare exception — test_inventory.py pins the
    # exact 4-key list (q_agg_approx, q_bpe_encode, q_multimodal_features,
    # q_sim_ivfpq_index); this is just the drift tripwire
    assert len(q) - len(o) <= 4


def test_reverify_queue_keys_enter_the_window():
    """A key whose oracle/semantics changed after its last driver green
    (reverify_queue.json stamp > last green round) must sit in the
    first-50 window ahead of untouched stale greens — its standing green
    certifies the OLD definition. Self-clearing: once a green lands in a
    round >= the stamp, the key reverts to normal staleness ordering."""
    mod = _entry()
    rq = mod._reverify_rounds()
    if not rq:
        return
    checked = _driver_checked()
    # last green / last seen round per key (mirrors _rotation)
    last_ok: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rno = int("".join(c for c in f.stem if c.isdigit()))
        for k, row in json.loads(f.read_text()).items():
            if not isinstance(row, dict):
                continue
            last_seen[k] = max(last_seen.get(k, 0), rno)
            good = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ) or (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            )
            if good:
                last_ok[k] = max(last_ok.get(k, 0), rno)
    pending = [
        k for k, rnd in rq.items() if k in last_ok and last_ok[k] < rnd
    ]
    window = set(list(mod.queries())[:50])
    waiting_outside = [k for k in pending if k not in window]
    if not waiting_outside:
        return
    # The queue may legitimately exceed the 50-key window (a wholesale
    # infra edit — e.g. round 12's load() plan memoization — lands in
    # every key's transitive digest and stamps the whole registry). The
    # binding invariant is that the driver drains the queue as fast as
    # the window allows: a pending key may wait outside only while every
    # window slot holds work of higher-or-equal priority (a failed latest
    # row, a never-checked key, or another pending reverify key) — never
    # an untouched stale green.
    def untouched_stale_green(k: str) -> bool:
        ok = last_ok.get(k)
        if ok is None or k not in checked:
            return False  # never checked — bucket 1, legitimately inside
        if last_seen.get(k, 0) > ok:
            return False  # latest row failed — bucket 0, highest priority
        return k not in pending
    displacing = sorted(k for k in window if untouched_stale_green(k))
    assert not displacing, (
        "oracle-changed keys wait outside the window while untouched "
        f"stale greens occupy window slots: {displacing[:10]} "
        f"(waiting outside: {waiting_outside[:10]}…)"
    )


def test_reverify_queue_keys_are_registered():
    from streaming_data_ingestion_spark.registry import all_queries

    rq = _entry()._reverify_rounds()
    stale = sorted(set(rq) - set(all_queries()))
    assert not stale, f"reverify_queue has unregistered keys: {stale}"

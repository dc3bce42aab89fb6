#!/usr/bin/env python3
"""Recompute registry_digests.json and auto-stamp edited green keys.

The ONLY sanctioned way to clear a digest-drift failure from
tests/test_keydigest.py. For every key whose live digest differs from
the stored one (or that has no stored entry yet):

* the digest entry is rewritten as {digest, round=current build round};
* if the key already holds a driver green from an earlier round, it is
  stamped into reverify_queue.json at the current round, which forces
  it into the next driver window (tests/test_rotation.py enforces the
  window placement) — the r8 failure mode, edited-but-unstamped, can no
  longer happen silently.

Keys that were never driver-checked need no stamp: the rotation's
priority-2 bucket already windows them first.

Run with --check to print what would change without writing. --init
seeds a fresh digest file where each key's round is its last
driver-green round (or its ledger registration round if never green) —
the bootstrap fiction that makes the invariant start satisfied; edits
from then on are detected against these baselines.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from keydigest import (  # noqa: E402
    DIGESTS_PATH,
    HERE,
    all_key_digests,
    current_round,
    last_green_rounds,
    load_digests,
)

QUEUE_PATH = os.path.join(HERE, "reverify_queue.json")


def effective_change_round(rno: int, green: int) -> int:
    """Round to record for a changed key (ADVICE r9): a key edited in
    the SAME round as its latest driver green would get digest round ==
    green round, making any queue stamp inert (the rotation only bites
    while last-green < stamp) — the r8 failure mode in miniature.
    Record such edits as green-round + 1 so the stamp forces
    re-certification in the next driver window regardless of
    intra-round ordering. Keys never green just take the build round."""
    return max(rno, green + 1) if green else rno


def _init() -> int:
    live = all_key_digests()
    greens = last_green_rounds()
    try:
        ledger = json.load(open(os.path.join(HERE, "registry_ledger.json")))
    except (OSError, json.JSONDecodeError):
        ledger = {}
    out = {
        k: {"digest": d, "round": greens.get(k) or ledger.get(k, 0)}
        for k, d in sorted(live.items())
    }
    with open(DIGESTS_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"initialized {len(out)} digests")
    return 0


def main(check_only: bool = False) -> int:
    live = all_key_digests()
    stored = load_digests()
    greens = last_green_rounds()
    rno = current_round()

    changed = sorted(
        k
        for k, d in live.items()
        if k not in stored or stored[k].get("digest") != d
    )
    dropped = sorted(set(stored) - set(live))

    if check_only:
        print(f"round={rno} changed={changed} dropped={dropped}")
        return 1 if (changed or dropped) else 0

    def _eff_round(k: str) -> int:
        return effective_change_round(rno, greens.get(k, 0))

    out = {
        k: (
            {"digest": live[k], "round": _eff_round(k)}
            if k in changed
            else stored[k]
        )
        for k in sorted(live)
    }
    with open(DIGESTS_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")

    try:
        queue = json.load(open(QUEUE_PATH))
    except (OSError, json.JSONDecodeError):
        queue = {}
    stamped = []
    for k in changed:
        if greens.get(k) and queue.get(k, 0) < _eff_round(k):
            queue[k] = _eff_round(k)
            stamped.append(k)
    with open(QUEUE_PATH, "w") as fh:
        json.dump(queue, fh, indent=2, sort_keys=True)
        fh.write("\n")

    print(
        f"round={rno}: {len(changed)} digest(s) updated, "
        f"{len(dropped)} dropped, re-verify stamped: {stamped or 'none'}"
    )
    return 0


if __name__ == "__main__":
    if "--init" in sys.argv:
        sys.exit(_init())
    sys.exit(main(check_only="--check" in sys.argv))

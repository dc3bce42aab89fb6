"""Bounded persist registry shared by operators that cache an
intermediate across consumer actions.

Spark's CacheManager dedupes identical canonical plans but never evicts:
an operator that persists a per-``sf_dir`` intermediate would accumulate
one cache entry for every distinct directory a long session touches.
The registry bounds that to AT MOST one live entry per operator key —
a repeat call with the same tag (sf_dir) reuses the entry, a different
tag unpersists the stale one first. Unpersisting only ever degrades an
old still-lazy result to recompute — never changes values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_REGISTRY: dict[str, tuple[str, DataFrame]] = {}


def bounded_persist(key: str, tag: str, build: Callable[[], DataFrame]) -> DataFrame:
    """Return a persisted DataFrame for (key, tag), holding at most one
    live cache entry per ``key`` regardless of how many tags are seen."""
    prev = _REGISTRY.get(key)
    if prev is not None and prev[0] == tag:
        return prev[1]
    if prev is not None:
        prev[1].unpersist()
    df = build().persist()
    _REGISTRY[key] = (tag, df)
    return df

"""Bounded registry for persisted intermediate frames.

Several operators persist a shared intermediate (a term-frequency
table, a slice histogram, SimHash fingerprints) because two or more
branches of the returned plan consume it — without the cache the
corpus-sized upstream job runs once per branch. But a bare
``.persist()`` on an intermediate that outlives the call leaks: Spark's
CacheManager holds the cached plan until an explicit ``unpersist()`` or
session end, so a long session (the 150-query bench loop, a notebook)
accumulates MEMORY_AND_DISK caches indefinitely.

``managed_persist`` is the middle ground: it persists the frame AND
enrolls it in a bounded FIFO (default 16 live entries). When the
registry overflows, the OLDEST entry is unpersisted. Worst case a
too-early eviction costs a recompute of that branch — a latency nit —
while memory stays bounded no matter how many operators run in the
session. Callers that know their intermediate's lifetime (e.g. an
operator that runs its terminal action internally) should still call
``release`` at the point of death; the registry is the backstop for
intermediates whose lifetime is tied to a lazily-consumed result.
"""
from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame

_CAP = 16
_LIVE: "OrderedDict[int, DataFrame]" = OrderedDict()


def managed_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and enroll it in the bounded registry. Returns the
    persisted frame. When more than ``_CAP`` managed frames are live the
    oldest is unpersisted (its consumers recompute if still lazy)."""
    d = df.persist() if storage_level is None else df.persist(storage_level)
    _LIVE[id(d)] = d
    while len(_LIVE) > _CAP:
        _, old = _LIVE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass  # the owning session may already be stopped
    return d


def release(df: DataFrame) -> None:
    """Unpersist ``df`` and drop it from the registry (no-op if it was
    never enrolled)."""
    _LIVE.pop(id(df), None)
    try:
        df.unpersist()
    except Exception:
        pass


def release_all() -> None:
    """Unpersist every managed frame — e.g. at the end of a bench run."""
    while _LIVE:
        _, old = _LIVE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass

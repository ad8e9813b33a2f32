"""Tracked persist: library operators cache intermediates whose
lifetime outlives the function that created them (the returned lazy
DataFrame still references them), so they cannot unpersist eagerly.
Instead every such persist registers here, and harnesses (bench, the
pipeline runner, long-lived sessions) release them at a safe point —
after the dependent action has run — with :func:`release_all`.

Without this, a session that runs many limma/ComBat/LSH queries
accumulates storage-memory blocks until Spark's LRU eviction starts
churning (VERDICT r2, "cache leak").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Strong refs, cleared by release_all: the JVM-side cache outlives the
# Python wrapper, so a WeakSet would drop the handle (and the ability
# to unpersist) as soon as the caller's variable goes out of scope.
_TRACKED: list[DataFrame] = []


def track(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_all`."""
    persisted = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(persisted)
    return persisted


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were
    released. Safe to call repeatedly — unpersist on a non-cached frame
    is a no-op."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n

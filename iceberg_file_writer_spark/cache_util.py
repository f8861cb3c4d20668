"""Cache hygiene for composed operators [extension — not in reference].

Operators cache their expensive internal relations; compositions
(evaluation entries that run an operand operator, canonicalization over
a shared pair relation, a bench harness running an entry twice) then
re-call ``.cache()`` on a plan the session already holds. Spark dedupes
the storage (no double memory) but logs ``CacheManager: asked to cache
already cached data`` — noise that masks real cache-lineage bugs.

``ensure_cached`` is the discipline: cache only when the canonicalized
plan is not already in the cache manager (``df.storageLevel`` consults
it), otherwise reuse — the already-cached InMemoryRelation is picked up
at planning time either way. Callers that conditionally skipped caching
must NOT later ``unpersist`` a relation they did not cache; Spark's
unpersist drops the cache entry for the PLAN, not the object, and would
evict the original owner's working set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def is_plan_cached(df: DataFrame) -> bool:
    """True if this DataFrame's (canonicalized) plan is in the session's
    cache manager — whether or not ``df`` itself called ``.cache()``."""
    lvl = df.storageLevel
    return bool(lvl.useMemory or lvl.useDisk)


def ensure_cached(df: DataFrame) -> DataFrame:
    """``df.cache()`` unless the plan is already cached, in which case
    the DataFrame is returned as-is (reads resolve to the existing
    InMemoryRelation)."""
    return df if is_plan_cached(df) else df.cache()


def cache_if_new(df: DataFrame) -> "tuple[DataFrame, bool]":
    """``ensure_cached`` with ownership reporting: returns
    ``(df, owned)`` where ``owned`` is True iff THIS call invoked
    ``.cache()``. Callers that unpersist on exit must unpersist only
    owned frames — unpersisting a plan another owner cached evicts that
    owner's entry (see module docstring)."""
    if is_plan_cached(df):
        return df, False
    return df.cache(), True

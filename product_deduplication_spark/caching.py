"""Explicit lifecycle for operator-internal Dataset caches.

``Dataset.persist`` registers the plan in Spark's CacheManager, which holds
a strong reference until ``unpersist()`` — the ContextCleaner never reclaims
it (it only tracks GC'd RDD objects, and the CacheManager keeps the plan
alive). An operator that persists an internal subtree and returns a lazy
DataFrame therefore leaks one cache entry per invocation in a long-lived
session: the incremental/streaming loop calls ``candidate_pairs`` once per
micro-batch, so without an explicit release the cached blocks accumulate for
the life of the job (memory pressure, then unbounded disk spill under
MEMORY_AND_DISK).

``CacheScope`` makes the lifetime a caller decision: operators register
their internal persists in the scope they were handed, and whoever
materialized the results releases the scope. Operators called without a
scope keep the old behavior (persist, rely on session teardown) so one-shot
scripts and tests are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects DataFrames persisted on behalf of a caller; ``release()``
    unpersists them all. Use as a context manager when the materialization
    happens inside the block::

        with CacheScope() as scope:
            pairs = candidate_pairs(feats, cfg, scope=scope)
            pairs.count()          # materialize while caches are live
        # caches released here
    """

    def __init__(self) -> None:
        self._cached: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        df = df.persist()
        self._cached.append(df)
        return df

    def add(self, df: DataFrame) -> DataFrame:
        """Register an already-persisted DataFrame for release."""
        self._cached.append(df)
        return df

    def release(self) -> None:
        for df in self._cached:
            df.unpersist()
        self._cached.clear()

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def persist_in(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """persist ``df``, registered in ``scope`` when one is given (explicit
    release by the caller that knows the lifetime), bare otherwise."""
    return scope.persist(df) if scope is not None else df.persist()

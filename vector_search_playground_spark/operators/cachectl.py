"""Ownership for operator-internal persists (r14 verdict #3 / ADVICE).

Several library operators (``setjoin.jaccard_join``,
``passjoin.edit_distance_pairs``, the dedup kernels) persist an
intermediate relation that feeds multiple subtrees of the DataFrame
they RETURN. The returned plan depends on those cached blocks, so the
operator cannot unpersist before returning — and a bare ``persist()``
with no owner leaks executor storage in any long-lived session that
composes operators (``doc_dup_fraction`` chains ``jaccard_join``
twice; the bench harness only gets away with it because it calls
``spark.catalog.clearCache()`` between reps).

Contract made explicit here:

- Operators persist through :func:`track`, which records the cached
  relation in a module-level registry alongside an EXPLICIT storage
  level — ``MEMORY_AND_DISK`` (Spark's DataFrame default, restated
  deliberately: at 100 TB the disk tier of a corpus-derived relation
  is a real materialization cost, accepted because every tracked
  relation feeds ≥ 2 consumers and the alternative is recomputing a
  corpus-scale subtree per consumer; a cluster short on local disk
  should switch the level here, in one place).
- The CALLER owns cleanup: after the operator's result has been fully
  consumed (collected / written), call :func:`release_operator_caches`
  (or ``spark.catalog.clearCache()``, which subsumes it). Consuming
  the result lazily and releasing early recomputes — correct, slower.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: the one storage level operator persists use — see module docstring
OPERATOR_STORAGE_LEVEL = StorageLevel.MEMORY_AND_DISK

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` at :data:`OPERATOR_STORAGE_LEVEL` and register it
    for :func:`release_operator_caches`. Returns ``df``."""
    df.persist(OPERATOR_STORAGE_LEVEL)
    _LIVE.append(df)
    return df


def release_operator_caches() -> int:
    """Unpersist every operator-tracked relation; returns the count.

    Blocking=False (Spark's default): blocks are dropped
    asynchronously, which is fine for the leak-prevention contract.
    """
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist()
        n += 1
    return n

"""Scoped lifecycle for the caches operators leave live.

Several operators persist an intermediate that the returned DataFrame
still reads (LSH signatures, IVF assignments, n-gram explodes, funnel
signals...).  The persist is load-bearing -- dropping it before the
caller materializes the result would re-run the expensive stage -- so
the operator cannot unpersist it itself, and before this module each
call site documented "release via clearCache()" and leaked storage
until someone did.

Two tools, composable:

* ``released_after(df)`` -- context manager for the common case: the
  operators below attach their live persist handles to the returned
  DataFrame (``attach_persists``); ``released_after`` yields the frame
  and unpersists exactly those handles on exit::

      with released_after(lsh_candidate_pairs(docs)) as pairs:
          pairs.count()
      # signature cache is gone; storage back to baseline

  ``release(df)`` is the non-context form for callers that manage
  their own try/finally.

* ``cache_scope(spark)`` -- diff-based safety net for arbitrary code:
  snapshots the persistent-RDD map on entry and unpersists every entry
  created inside the block on exit (DataFrame persists surface here via
  the InMemoryRelation's cached column buffers).  Used by bench.py so
  no query's cache can leak into the next timing, whatever operator
  created it.

Neither touches caches that existed before the scope, unlike
``spark.catalog.clearCache()`` which nukes a whole session.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

_ATTR = "_xps_live_persists"


def attach_persists(df: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record ``cached`` as the live persists backing ``df``.

    Handles already attached to any of the ``cached`` frames propagate
    (an operator consuming another operator's cached output passes the
    whole chain along), so ``release`` on the final frame frees every
    level.  Returns ``df`` for expression-style use.
    """
    handles: list[DataFrame] = list(getattr(df, _ATTR, ()))
    for c in cached:
        for inner in (*getattr(c, _ATTR, ()), c):
            if id(inner) not in _ids(handles):
                handles.append(inner)
    setattr(df, _ATTR, tuple(handles))
    return df


def _ids(seq: Sequence[DataFrame]) -> set[int]:
    return {id(x) for x in seq}


def live_persists(df: DataFrame) -> tuple[DataFrame, ...]:
    """The persist handles attached to ``df`` (empty tuple if none)."""
    return tuple(getattr(df, _ATTR, ()))


def release(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist every handle attached to ``df`` (idempotent)."""
    for c in live_persists(df):
        c.unpersist(blocking)
    try:
        setattr(df, _ATTR, ())
    except AttributeError:  # pragma: no cover - frozen wrappers
        pass


@contextmanager
def released_after(
    df: DataFrame, blocking: bool = False
) -> Iterator[DataFrame]:
    """``with released_after(op(...)) as out: out.write...`` -- yields
    the frame, releases its attached persists on exit (including on
    error)."""
    try:
        yield df
    finally:
        release(df, blocking)


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@contextmanager
def cache_scope(
    spark: SparkSession, blocking: bool = False
) -> Iterator[None]:
    """Unpersist every RDD/DataFrame cache entry created inside the
    block.  Entries that existed before the scope are untouched.

    DataFrame ``persist()`` materializes through an InMemoryRelation
    whose cached column buffers are a persisted RDD, so it shows up in
    ``getPersistentRDDs`` once an action runs; dropping that RDD frees
    the storage (a later identical plan would transparently recompute
    and re-cache).
    """
    before = _persistent_rdd_ids(spark)
    try:
        yield
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for k in jmap.keySet().toArray():
            if int(k) not in before:
                jmap.get(k).unpersist(blocking)

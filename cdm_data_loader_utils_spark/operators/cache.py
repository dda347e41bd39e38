"""Lifetime management for operator-internal persisted DataFrames.

Several operators (:func:`dedup.minhash_lsh_pairs`, :func:`dedup.simhash_pairs`,
:func:`dedup.jaccard_pairs`, :func:`similarity.cosine_pairs_blocked`) persist
intermediates that feed multiple join sides — without the persist the whole
normalize/hash pipeline re-executes per use (measured 1.7-9x at sf1). Spark
pins those blocks until the session ends; the storage pool LRU-evicts them
under pressure, so correctness never depends on release, but a long-lived
session looping over corpora should reclaim them deterministically:

    pairs = minhash_lsh_pairs(docs)
    n = pairs.count()
    release(pairs)          # unpersists the operator's internal caches
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_lake_cached_deps"


class _RddCacheHandle:
    """Releasable handle for storage that ``DataFrame.unpersist`` cannot
    reach — ``localCheckpoint`` pins its internal RDD directly in the
    block manager, bypassing the SQL cache manager. Captured by RDD id and
    unpersisted through ``JavaSparkContext.getPersistentRDDs`` (already
    gone → no-op). NOTE: a locally-checkpointed frame has truncated lineage
    and CANNOT recompute after its handle is released — release such
    results only once fully consumed."""

    def __init__(self, spark, rdd_ids: set[int]):
        self._jsc = spark.sparkContext._jsc
        self._ids = set(rdd_ids)

    def unpersist(self) -> None:
        m = self._jsc.getPersistentRDDs()
        for i in self._ids:
            r = m.get(i)
            if r is not None:
                r.unpersist()
        self._ids = set()


def local_checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, _RddCacheHandle]:
    """``df.localCheckpoint(eager=True)`` plus a handle to the checkpoint's
    pinned RDD blocks, so iterative operators can free superseded rounds
    immediately and :func:`track` the final round for :func:`release` —
    without this every loop iteration leaks one checkpoint's storage until
    the session dies. The id capture diffs ``getPersistentRDDs`` around the
    eager checkpoint; concurrent persists from OTHER driver threads during
    that window would be over-captured (single-driver-thread operators, the
    only users here, are unaffected)."""
    spark = df.sparkSession
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    new_ids = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    return out, _RddCacheHandle(spark, new_ids)


def track(out: DataFrame, *deps) -> DataFrame:
    """Record persisted dependencies (DataFrames or
    :class:`_RddCacheHandle`-like objects exposing ``unpersist()``) on the
    operator's result so :func:`release` can unpersist them once the caller
    is done."""
    merged = list(getattr(out, _ATTR, ())) + list(deps)
    setattr(out, _ATTR, merged)
    return out


def propagate(out: DataFrame, *sources: DataFrame) -> DataFrame:
    """Carry the recorded caches of ``sources`` onto a COMPOSED result
    (cluster closure over a pair generator, a filtered projection, …) so
    ``release(composed)`` still reclaims the upstream operator's internals.
    Without this, wrapping transforms silently drop the dep list and the
    release becomes a no-op."""
    deps = [d for s in sources for d in getattr(s, _ATTR, ())]
    return track(out, *deps) if deps else out


def release(df: DataFrame) -> int:
    """Unpersist every internal cache recorded on ``df``. Plain persisted
    deps leave the frame usable (it recomputes if re-executed); checkpoint
    handles (:class:`_RddCacheHandle` — e.g. ``connected_components``
    internals) do NOT — release those results only after consuming them.
    Returns the number of caches released. Safe on any DataFrame."""
    deps = list(getattr(df, _ATTR, ()))
    for d in deps:
        try:
            d.unpersist()
        except Exception:  # noqa: BLE001 — best-effort reclamation
            pass
    if deps:
        setattr(df, _ATTR, [])
    return len(deps)

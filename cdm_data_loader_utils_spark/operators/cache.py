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


def track(out: DataFrame, *deps: DataFrame) -> DataFrame:
    """Record persisted dependency frames on the operator's result so
    :func:`release` can unpersist them once the caller is done."""
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
    """Unpersist every internal cache recorded on ``df`` (and leave the
    frame usable — it just recomputes if re-executed). Returns the number
    of caches released. Safe on any DataFrame."""
    deps = list(getattr(df, _ATTR, ()))
    for d in deps:
        try:
            d.unpersist()
        except Exception:  # noqa: BLE001 — best-effort reclamation
            pass
    if deps:
        setattr(df, _ATTR, [])
    return len(deps)

"""Snapshot-pair diff → change events (batch-mode CDC derivation).

Re-expresses the reference's hash-snapshot change detection, the heart of its
incremental-update loop:

* ``detect_updated_or_new_hashes`` — filter two tags, full-outer join on the
  key, classify ``change_type`` ∈ {new, updated, deleted, unchanged}
  (``/root/reference/src/cdm_data_loader_utils/parsers/refseq_pipeline/core/
  snapshot_utils.py:37-61``);
* pairwise anti-joins for new-only / removed-only keys
  (``core/snapshot_utils.py:16-31``);
* inner join for changed keys (``core/snapshot_utils.py:5-13``);
* full-outer diff with null/≠ OR-chain (``core/hashes_diff.py:61-80``).

Everything is a single Catalyst plan: one shuffle on the key, predicate
pushdown on the tag filters, AQE-coalesced output. At 100 TB the two sides
are partition-pruned scans of the same snapshot table (tag is a partition
key) joined shuffle-to-shuffle; no driver collect anywhere (the reference
collects changed keys to a driver dict at ``hashes_diff.py:90-109`` — we
replace that with a broadcast join, see :func:`resolve_affected`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_NEW = "new"
CHANGE_UPDATED = "updated"
CHANGE_DELETED = "deleted"
CHANGE_UNCHANGED = "unchanged"


def classify_changes(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Full-outer join + 4-way change_type ladder (J2 operator).

    Output: key columns, old/new value columns (prefixed), ``change_type``.
    """
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
        F.lit(True).alias("__old_present"),
    ).alias("o")
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
        F.lit(True).alias("__new_present"),
    ).alias("n")
    joined = o.join(n, on=key_cols, how="full_outer")
    # presence comes from explicit join markers, NOT from value-column
    # null-ness: a row legitimately present with an all-null payload must
    # still count as present (the reference never hits this because its
    # single hash column is guaranteed non-null, snapshot_utils.py:37-61 —
    # this generalization has to handle nullable value columns)
    old_present = F.coalesce(F.col("__old_present"), F.lit(False))
    new_present = F.coalesce(F.col("__new_present"), F.lit(False))
    # presence-only diffs (value_cols=[]) are legitimate: rows common to
    # both sides are then always UNCHANGED
    any_diff = F.lit(False)
    for c in value_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        any_diff = any_diff | d
    change = (
        F.when(~old_present & new_present, F.lit(CHANGE_NEW))
        .when(old_present & ~new_present, F.lit(CHANGE_DELETED))
        .when(any_diff, F.lit(CHANGE_UPDATED))
        .otherwise(F.lit(CHANGE_UNCHANGED))
    )
    return joined.withColumn("change_type", change).drop(
        "__old_present", "__new_present"
    )


def diff_snapshots(
    snapshots: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    tag_col: str = "tag",
    old_tag: str | None = None,
    new_tag: str | None = None,
) -> DataFrame:
    """Diff two tagged snapshots stored in one table (S-diff lifecycle,
    ``core/snapshot_utils.py:37-61``). When tags are omitted, uses the two
    most recent tags by max ``retrieved_at`` (``core/hashes_diff.py:46-58``).
    """
    if old_tag is None or new_tag is None:
        tags = [
            r[0]
            for r in snapshots.groupBy(tag_col)
            .agg(F.max("retrieved_at").alias("m"))
            # tag as tiebreak: two tags stamped in the same instant must
            # still pick a DETERMINISTIC old/new orientation across reruns
            .orderBy(F.col("m").desc(), F.col(tag_col).desc())
            .limit(2)
            .collect()
        ]
        if len(tags) < 2:
            raise ValueError("need at least two snapshot tags to diff")
        new_tag, old_tag = tags[0], tags[1]
    old = snapshots.filter(F.col(tag_col) == old_tag)
    new = snapshots.filter(F.col(tag_col) == new_tag)
    return classify_changes(old, new, key_cols, value_cols)


def changed_keys(diffed: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys that are new or updated (what gets selectively re-ingested —
    ``core/snapshot_utils.py:59-61`` keeps ``new|updated``)."""
    return (
        diffed.filter(F.col("change_type").isin(CHANGE_NEW, CHANGE_UPDATED))
        .select(*key_cols)
        .distinct()
    )


def new_only(old: DataFrame, new: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys present only in the new snapshot (left-anti, J4;
    ``core/snapshot_utils.py:16-23``)."""
    return new.join(old, on=key_cols, how="left_anti").select(*key_cols).distinct()


def removed_only(old: DataFrame, new: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys present only in the old snapshot (``core/snapshot_utils.py:24-31``)."""
    return old.join(new, on=key_cols, how="left_anti").select(*key_cols).distinct()


def resolve_affected(
    changed: DataFrame, index: DataFrame, key_cols: list[str], resolve_col: str
) -> DataFrame:
    """Map changed keys to affected parent entities via a broadcast join —
    distributed replacement for the reference's driver-side dict lookup
    (``core/hashes_diff.py:90-109`` collects all changed keys then probes a
    Python dict; at 10^10 keys that driver hop is the scalability wall)."""
    return (
        changed.join(F.broadcast(index), on=key_cols, how="inner")
        .select(resolve_col)
        .distinct()
    )


def to_change_events(
    diffed: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    lsn_offset: int = 0,
) -> DataFrame:
    """Convert a snapshot diff into the engine's change-event envelope
    (op/lsn), bridging batch snapshot-mode ingest into the same MERGE path
    the streaming tail uses (SURVEY §2.8 mapping table).

    LSNs are synthesized deterministically from the key hash — within one
    diff there is exactly one event per key, so any unique, reproducible
    assignment is a valid WAL order."""
    ev = diffed.filter(F.col("change_type") != CHANGE_UNCHANGED)
    op = (
        F.when(F.col("change_type") == CHANGE_DELETED, F.lit("d"))
        .when(F.col("change_type") == CHANGE_NEW, F.lit("i"))
        .otherwise(F.lit("u"))
    )
    # content-derived, deterministic, parallel — but a 64-bit hash is NOT
    # collision-free (~N²/2^64 expected ties at 10^10 keys). Ties are
    # harmless downstream because each synthesized event also carries its
    # distinct key and LWW dedup orders within (key, lsn); consumers that
    # need a strictly unique global WAL order must assign real LSNs
    lsn = (
        F.abs(F.xxhash64(*[F.col(k) for k in key_cols])) + F.lit(lsn_offset)
    ).cast("long")
    cols = [op.alias("op"), lsn.alias("lsn"), *key_cols]
    for c in value_cols:
        cols.append(
            F.when(F.col("change_type") == CHANGE_DELETED, F.lit(None))
            .otherwise(F.col(f"new_{c}"))
            .alias(c)
        )
    return ev.select(*cols)

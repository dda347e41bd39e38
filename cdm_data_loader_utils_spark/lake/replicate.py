"""Incremental lake-to-lake replication driven by the change data feed.

The reference keeps downstream copies current by re-running full loads
(``/root/reference/src/cdm_data_loader_utils/cli/detect_updates.py:68-102``
diffs snapshots to find what to reload). Here the composition
``changes() → to_change_events() → merge_cdc()`` is promoted to a
first-class, resumable operator: each :meth:`Replicator.sync` ships only
the rows that changed since the last shipped source snapshot, with its own
durable watermark, so a lakehouse mirror is O(changed buckets) per sync
instead of O(table).

Delivery semantics — convergent, resumable, exactly-once-fenced:

* the watermark (last shipped source snapshot id) lives in a
  ``VersionedJsonLog`` under ``state_dir`` — same atomic create-exclusive
  commit protocol as the table log, so a crashed sync never records a
  watermark for work it did not finish;
* a crash AFTER the merge but BEFORE the watermark write re-ships the
  range on the next sync: the destination's commit fence turns an exact
  re-delivery into a no-op, and a WIDER range (source moved meanwhile) is
  state-convergent because :meth:`LakeTable.changes` always diffs against
  real snapshots — re-applied events carry the final values;
* per-sync LSNs are ``key-hash + source snapshot id`` (the
  :func:`to_change_events` contract): a key re-shipped by a later sync
  always carries a larger LSN, so destination LWW prefers the newer
  increment — syncs can overlap or repeat in any order;
* when the source has EXPIRED the watermarked snapshot
  (``expire_snapshots`` outran the sync cadence), sync falls back to a
  full reconciliation diff — destination-vs-source ``classify_changes`` —
  which also serves as the bootstrap for an empty destination and, unlike
  an insert-only copy, ships DELETES for rows the destination has but the
  source dropped.

Scale shape: the steady-state path reads only buckets whose manifests
moved (``changes`` pruning); the reconciliation path is one full outer
join, paid only on bootstrap or after losing the watermark.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .fs import VersionedJsonLog, filesystem_for
from .table import LakeTable


class Replicator:
    """Resumable incremental copy of ``src`` into ``dst`` keyed by
    ``key_cols``. Construct once per (src, dst) pair with a durable
    ``state_dir``; call :meth:`sync` after (or on a schedule independent
    of) upstream commits. The destination may use a different bucket
    layout; its schema evolves with the source's through the normal merge
    reconciliation."""

    def __init__(
        self,
        src: LakeTable,
        dst: LakeTable,
        key_cols: list[str],
        state_dir: str,
        name: str = "replica",
        validate_keys: bool = False,
    ):
        self.src = src
        self.dst = dst
        self.key_cols = list(key_cols)
        self.name = name
        self.validate_keys = validate_keys
        fs = filesystem_for(src.spark, state_dir)
        fs.mkdirs(state_dir)
        self._log = VersionedJsonLog(fs, fs.normalize(state_dir))

    # ------------------------------------------------------------- watermark
    def watermark(self) -> int | None:
        """Last source snapshot id fully shipped to the destination."""
        v = self._log.latest_version()
        if v is None:
            return None
        return int(self._log.read(v)["from_snapshot"])

    def _advance(self, sid: int) -> None:
        v = self._log.latest_version() or 0
        # single-replicator-per-state-dir contract; a racing second
        # replicator surfaces as FileExistsError rather than last-writer-wins
        self._log.write_exclusive(v + 1, {"from_snapshot": int(sid)})

    # ------------------------------------------------------------------ sync
    def sync(self) -> dict:
        """Ship changes since the watermark; returns
        ``{"mode": "noop"|"incremental"|"reconcile", "from", "to",
        "events"}``. Safe to call concurrently with upstream writers — the
        shipped range is a committed snapshot pair, never a moving read."""
        from ..operators.snapshot_diff import (
            CHANGE_UNCHANGED,
            classify_changes,
            to_change_events,
        )

        cur = self.src.snapshot_id
        last = self.watermark()
        if last == cur:
            return {"mode": "noop", "from": last, "to": cur, "events": 0}
        value_cols = [
            f.name for f in self.src.user_schema.fields
            if f.name not in self.key_cols
        ]
        if last is not None and last in self.src._versions():
            mode = "incremental"
            feed = self.src.changes(
                self.key_cols, last, cur, validate_keys=self.validate_keys
            )
        else:
            # bootstrap (last is None) or watermark expired upstream:
            # full reconciliation diff — ships deletes too, unlike a copy
            mode = "reconcile"
            feed = classify_changes(
                self.dst.read(),
                self.src.read(snapshot_id=cur),
                self.key_cols,
                value_cols,
            ).filter(F.col("change_type") != CHANGE_UNCHANGED)
        ev = to_change_events(
            feed, self.key_cols, value_cols, lsn_offset=cur
        ).persist()
        try:
            n = ev.count()
            if n:
                self.dst.merge_cdc(
                    ev,
                    key_cols=self.key_cols,
                    fence_key=f"{self.name}:{last}->{cur}",
                    incoming_rows=n,
                )
        finally:
            ev.unpersist()
        self._advance(cur)
        return {"mode": mode, "from": last, "to": cur, "events": n}

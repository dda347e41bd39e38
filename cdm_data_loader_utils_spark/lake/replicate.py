"""Incremental lake-to-lake replication driven by the change data feed.

The reference keeps downstream copies current by re-running full loads
(``/root/reference/src/cdm_data_loader_utils/cli/detect_updates.py:68-102``
diffs snapshots to find what to reload). Here the composition
``changes() → to_change_events() → merge_cdc()`` is promoted to a
first-class, resumable operator: each :meth:`Replicator.sync` ships only
the rows that changed since the last shipped source snapshot, with its own
durable watermark, so a lakehouse mirror is O(changed buckets) per sync
instead of O(table).

Delivery protocol — two-phase, convergent, exactly-once-fenced:

* state lives in a ``VersionedJsonLog`` under ``state_dir`` (same atomic
  create-exclusive commits as the table log): ``{"from_snapshot": N,
  "pending": [lo, hi] | null}``;
* a sync first records its INTENT (``pending=[last, cur]``), then merges,
  then advances the watermark and clears the intent. A crash between merge
  and advance therefore re-ships EXACTLY the recorded range on resume —
  where the destination's commit fence turns the re-delivery into a no-op.
  Without the intent, a resume would diff a WIDER range (source moved
  meanwhile) and silently skip keys whose net change across the widened
  range is zero (inserted then deleted, or delete+reinsert-same-value)
  even though the crashed sync had already shipped half their lifecycle;
* per-sync LSNs are ``key-hash + shipped-snapshot id`` (the
  :func:`to_change_events` contract): a key re-shipped by a later sync
  always carries a larger LSN, so destination LWW prefers the newer
  increment;
* when the source has EXPIRED a needed snapshot (``expire_snapshots``
  outran the sync cadence), sync falls back to a full reconciliation diff
  — destination-vs-source ``classify_changes`` with the destination
  aligned to the source's user schema first — which also serves as the
  bootstrap for an empty destination and, unlike an insert-only copy,
  ships DELETES for rows the destination has but the source dropped;
* superseded state versions are pruned after each advance, so state_dir
  stays O(1) files no matter how many syncs have ever run.

``name`` scopes the destination-side fence keys and defaults to a hash of
the source path — two replicators fanning DIFFERENT sources into one
destination therefore never collide; if you pass an explicit name, keep it
unique per (source, destination) pair.

Scale shape: the steady-state path reads only buckets whose manifests
moved (``changes`` pruning); the reconciliation path is one full outer
join, paid only on bootstrap or after losing a needed snapshot.
"""

from __future__ import annotations

import hashlib
import warnings

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fs import VersionedJsonLog, filesystem_for
from .table import LakeTable, _META_COLS, _align_to_schema


class Replicator:
    """Resumable incremental copy of ``src`` into ``dst`` keyed by
    ``key_cols``. Construct once per (src, dst) pair with a durable
    ``state_dir``; call :meth:`sync` after (or on a schedule independent
    of) upstream commits. The destination may use a different bucket
    layout; its schema evolves with the source's through the normal merge
    reconciliation. One replicator per state_dir — a racing second writer
    surfaces as FileExistsError, never last-writer-wins."""

    def __init__(
        self,
        src: LakeTable,
        dst: LakeTable,
        key_cols: list[str],
        state_dir: str,
        name: str | None = None,
        validate_keys: bool = False,
    ):
        self.src = src
        self.dst = dst
        self.key_cols = list(key_cols)
        self.name = name or (
            "replica-" + hashlib.sha256(src.path.encode()).hexdigest()[:12]
        )
        self.validate_keys = validate_keys
        fs = filesystem_for(src.spark, state_dir)
        fs.mkdirs(state_dir)
        self._log = VersionedJsonLog(fs, fs.normalize(state_dir))

    # ------------------------------------------------------------- watermark
    def _state(self) -> tuple[int, dict]:
        v = self._log.latest_version()
        if v is None:
            return 0, {"from_snapshot": None, "pending": None}
        return v, self._log.read(v)

    def watermark(self) -> int | None:
        """Last source snapshot id fully shipped to the destination."""
        w = self._state()[1]["from_snapshot"]
        return None if w is None else int(w)

    def _write_state(self, version: int, doc: dict) -> None:
        self._log.write_exclusive(version, doc)
        # keep a short tail for post-mortems; prune the rest so state cost
        # stays O(1) regardless of how many syncs have ever run
        for old in self._log.versions()[:-4]:
            try:
                self._log.fs.delete(self._log.path(old))
            except Exception as e:  # noqa: BLE001 — pruning is best-effort
                # sync already committed; but a PERSISTENT delete failure
                # would silently grow state_dir forever — keep it observable
                warnings.warn(
                    f"replicator {self.name}: failed to prune state "
                    f"version {old}: {e}",
                    stacklevel=2,
                )

    # ------------------------------------------------------------------ sync
    def sync(self) -> dict:
        """Ship changes since the watermark; returns
        ``{"mode": "noop"|"incremental"|"reconcile", "from", "to",
        "events", "resumed"}``. Safe to call concurrently with upstream
        writers — the shipped range is a committed snapshot pair (resolved
        once, up front), never a moving read."""
        v, st = self._state()
        pending = st.get("pending")
        if pending is not None:
            # a prior sync recorded intent and may or may not have merged —
            # finish EXACTLY that range; the fence absorbs re-delivery
            lo = None if pending[0] is None else int(pending[0])
            hi = int(pending[1])
            mode, n, shipped_to = self._ship(lo, hi)
            self._write_state(
                v + 1, {"from_snapshot": shipped_to, "pending": None}
            )
            return {"mode": mode, "from": lo, "to": shipped_to,
                    "events": n, "resumed": True}
        last = st["from_snapshot"]
        last = None if last is None else int(last)
        cur = self.src.snapshot_id
        if last == cur:
            return {"mode": "noop", "from": last, "to": cur, "events": 0,
                    "resumed": False}
        self._write_state(
            v + 1, {"from_snapshot": last, "pending": [last, cur]}
        )
        mode, n, shipped_to = self._ship(last, cur)
        self._write_state(
            v + 2, {"from_snapshot": shipped_to, "pending": None}
        )
        return {"mode": mode, "from": last, "to": shipped_to, "events": n,
                "resumed": False}

    # ------------------------------------------------------------- internals
    def _ship(self, lo: int | None, hi: int) -> tuple[str, int, int]:
        """Deliver source range ``lo → hi`` to the destination; returns
        (mode, events, snapshot actually shipped to). If ``hi`` itself has
        expired upstream (possible only on a resumed intent), the range is
        unrecoverable and the fallback reconciles against the CURRENT
        source snapshot instead."""
        from ..operators.snapshot_diff import (
            CHANGE_UNCHANGED,
            classify_changes,
            to_change_events,
        )

        try:
            snap_hi = self.src.snapshot(hi)
        except Exception:  # noqa: BLE001 — see expiry check below
            # Hadoop stores surface an expired snapshot as a py4j-wrapped
            # JVM exception, not Python's FileNotFoundError (same divergence
            # the snapshot() walk documents) — so catch broadly, then
            # CONFIRM the snapshot is actually gone before falling back;
            # a transient read error must stay loud, not silently turn an
            # incremental sync into a full reconcile
            if hi in self.src._versions():
                raise
            hi = self.src.snapshot_id
            snap_hi = self.src.snapshot(hi)
            lo = None  # forces the reconcile branch below
        # schema of the PINNED endpoint, not "latest": a schema-evolving
        # upstream commit racing this sync must not change what we select
        user_schema = T.StructType([
            f for f in self.src.schema(snap_hi).fields
            if f.name not in _META_COLS
        ])
        value_cols = [
            f.name for f in user_schema.fields if f.name not in self.key_cols
        ]
        if lo is not None and lo in self.src._versions():
            mode = "incremental"
            feed = self.src.changes(
                self.key_cols, lo, hi, validate_keys=self.validate_keys
            )
        else:
            mode = "reconcile"
            # align the destination to the source's user schema first:
            # columns the source evolved since the last sync become typed
            # nulls on the dst side (they diff as null → value), instead of
            # an unresolved-column crash in exactly the expired-watermark
            # scenario this fallback exists for
            dst_df = _align_to_schema(self.dst.read(), user_schema)
            src_df = self.src.read(snapshot_id=hi)
            if self.validate_keys:
                for side, df_ in (("destination", dst_df), ("source", src_df)):
                    dups = (
                        df_.groupBy(*self.key_cols).count()
                        .filter(F.col("count") > 1)
                        .agg(F.coalesce(
                            F.sum(F.col("count") - 1), F.lit(0)
                        ).alias("extra"))
                        .collect()[0]["extra"]
                    )
                    if dups:
                        raise ValueError(
                            f"replicate reconcile: {side} holds "
                            f"{dups} duplicate row(s) for "
                            f"{self.key_cols} — a keyed diff cannot "
                            f"represent row multiplicity"
                        )
            feed = classify_changes(
                dst_df, src_df, self.key_cols, value_cols
            ).filter(F.col("change_type") != CHANGE_UNCHANGED)
        ev = to_change_events(
            feed, self.key_cols, value_cols, lsn_offset=hi
        ).persist()
        try:
            n = ev.count()
            if n:
                self.dst.merge_cdc(
                    ev,
                    key_cols=self.key_cols,
                    fence_key=f"{self.name}:{lo}->{hi}",
                    incoming_rows=n,
                )
        finally:
            ev.unpersist()
        return mode, n, hi

"""Name-addressed table catalog over the pluggable filesystem layer.

The reference registers every table in a metastore so pipelines address
``namespace.table`` instead of paths
(``/root/reference/src/cdm_data_loader_utils/parsers/refseq_pipeline/core/
spark_delta.py:160-175`` ``CREATE TABLE ... USING DELTA LOCATION``;
``utils/spark_delta.py:212-224``). No metastore ships here, so the catalog
is itself a tiny versioned manifest under the warehouse root — same
atomic-exclusive commit protocol as the table snapshot log, so concurrent
registrations are safe on any filesystem the FS layer supports.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .fs import VersionedJsonLog, filesystem_for
from .table import LakeTable, _view_ident, _view_parts

_CATALOG_DIR = "_catalog"


class Catalog:
    """warehouse-rooted ``namespace.table`` → path registry."""

    def __init__(self, spark: SparkSession, warehouse: str, fs=None):
        self.spark = spark
        self.fs = fs if fs is not None else filesystem_for(spark, warehouse)
        self.warehouse = self.fs.normalize(warehouse)
        self.fs.mkdirs(self.fs.join(self.warehouse, _CATALOG_DIR))
        self._log = VersionedJsonLog(
            self.fs, self.fs.join(self.warehouse, _CATALOG_DIR)
        )

    # ------------------------------------------------------------- manifest
    def _read(self) -> tuple[int, dict]:
        v = self._log.latest_version()
        if v is None:
            return 0, {}
        return v, self._log.read(v)

    def _cas(self, mutate, max_retries: int = 5) -> None:
        """Read-modify-write with optimistic retry; version slot and payload
        always derive from the SAME read (the shared VersionedJsonLog
        contract). ``mutate(dict) -> dict | None``; None means no-op."""
        attempt = 0
        while True:
            v, cur = self._read()
            nxt = mutate(dict(cur))
            if nxt is None:
                return
            try:
                self._log.write_exclusive(v + 1, nxt)
                return
            except FileExistsError:
                if attempt >= max_retries:
                    raise
                time.sleep(0.05 * (2 ** attempt))
                attempt += 1

    # --------------------------------------------------------------- tables
    def table_path(self, name: str) -> str:
        """Default physical layout: dots become directory levels."""
        return self.fs.join(self.warehouse, *name.split("."))

    def register(self, name: str, path: str | None = None,
                 overwrite: bool = False) -> str:
        """Map ``name`` → ``path``. Re-registering the SAME path is a no-op;
        re-pointing an existing name to a DIFFERENT path silently orphans the
        old table's data, so it raises unless ``overwrite=True`` (the CAS
        mutate re-checks on every retry, so a racing first-register wins and
        the loser surfaces the conflict instead of last-writer-wins)."""
        p = path if path is not None else self.table_path(name)

        def _mut(m: dict):
            old = m.get(name)
            if old == p:
                return None  # idempotent re-register
            if old is not None and not overwrite:
                raise ValueError(
                    f"catalog name {name!r} already maps to {old!r}; pass "
                    f"overwrite=True to re-point it to {p!r} (the old "
                    f"table's data is NOT deleted)"
                )
            m[name] = p
            return m

        self._cas(_mut)
        return p

    def resolve(self, name: str) -> str:
        _, m = self._read()
        if name not in m:
            raise KeyError(f"table {name!r} not in catalog at {self.warehouse}")
        return m[name]

    def exists(self, name: str) -> bool:
        _, m = self._read()
        return name in m and LakeTable.exists(m[name], spark=self.spark)

    def tables(self) -> dict[str, str]:
        return self._read()[1]

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        bucket_by: str | None = None,
        bucket_count: int = 16,
    ) -> LakeTable:
        path = self.register(name)
        return LakeTable.create(
            self.spark, path, schema, bucket_by=bucket_by, bucket_count=bucket_count
        )

    def load_table(self, name: str) -> LakeTable:
        return LakeTable.load(self.spark, self.resolve(name))

    def register_views(self, names: list[str] | None = None) -> dict[str, str]:
        """Bridge the catalog into ``spark.sql``: every registered lake table
        becomes a session-catalog VIEW under its namespace database, so
        downstream users run ``spark.sql("SELECT … FROM ns.t")`` directly —
        the reference's register-table-and-view surface
        (``parsers/gene_association_file.py:225-242``).

        Views pin the CURRENT snapshot's file list (see
        :meth:`LakeTable.as_sql`; the pinned snapshot id is stamped as the
        view property ``lake.snapshot_id`` — ask
        :meth:`LakeTable.view_status` whether a view is current). A view
        auto-refreshes after commits made through the SAME table handle
        (``LakeTable.to_view`` live-view contract); commits from other
        handles or processes are picked up by calling :meth:`refresh_views`.
        Returns ``name → view identifier``. Names whose path holds no table
        yet are skipped."""
        out: dict[str, str] = {}
        wanted = self.tables() if names is None else {
            n: self.resolve(n) for n in names
        }
        pins = self._view_pins
        for name, path in wanted.items():
            if not LakeTable.exists(path, spark=self.spark):
                continue
            t = LakeTable.load(self.spark, path)
            # pin from a read taken BEFORE registration: if a commit lands
            # between this read and to_view's own latest-resolve, the pin is
            # ≤ the snapshot the view text actually pinned — the safe
            # direction (worst case one redundant refresh). Reading AFTER
            # could record a NEWER id than the text and make refresh_views
            # skip a genuinely stale view forever.
            sid = t.snapshot_id
            # re-registration must not silently disarm a read-time
            # staleness guard a previous to_view(assert_current=True)
            # armed — same preservation rule as refresh_views
            props = self._view_props(name)
            out[name] = t.to_view(
                name,
                assert_current=(props or {}).get("lake.assert_current") == "true",
            )
            pins[name] = (path, sid)
        return out

    @property
    def _view_pins(self) -> dict[str, tuple[str, int]]:
        """name → (path, snapshot id the view was generated at) for views
        registered through THIS catalog object."""
        pins = getattr(self, "_pins", None)
        if pins is None:
            pins = self._pins = {}
        return pins

    def refresh_views(self, names: list[str] | None = None) -> dict[str, str]:
        """Re-point registered SQL views at each table's CURRENT snapshot —
        the cross-process staleness escape hatch (same-handle commits
        already auto-refresh their live views). Tables whose view's STAMPED
        ``lake.snapshot_id`` property already equals the latest snapshot id
        are SKIPPED after one metadata-listing read plus one in-memory
        catalog property read — no view-text regeneration — so calling this
        on a schedule is O(tables) cheap when nothing moved. Because the
        decision reads the stamp on the view itself (written by ``to_view``
        at registration, so always consistent with the view text) rather
        than this object's in-memory pins, the fast path works from a FRESH
        ``Catalog`` in a new process, and a view another handle re-pinned to
        an older snapshot is correctly re-pointed at current. Returns only
        the views actually re-pointed (plus any never-registered names,
        which are registered fresh)."""
        wanted = self.tables() if names is None else {
            n: self.resolve(n) for n in names
        }
        pins = self._view_pins
        out: dict[str, str] = {}
        for name, path in wanted.items():
            if not LakeTable.exists(path, spark=self.spark):
                continue
            t = LakeTable.load(self.spark, path)
            sid = t.snapshot_id
            props = self._view_props(name)
            if props is not None and \
                    props.get("lake.path") == self.fs.normalize(path) and \
                    props.get("lake.snapshot_id") == str(int(sid)):
                # fast no-op: the stamp to_view wrote (always consistent
                # with the view text) already points at the latest snapshot
                pins[name] = (path, sid)
                continue
            # a re-registration preserves the read-time staleness guard the
            # view opted into (stamped as lake.assert_current)
            out[name] = t.to_view(
                name,
                assert_current=(props or {}).get("lake.assert_current") == "true",
            )
            pins[name] = (path, sid)
        return out

    def _view_props(self, name: str) -> dict | None:
        """Stamped TBLPROPERTIES of the session view for ``name``, or None
        if no such view exists. Existence is probed with the COLLAPSED
        identifier (``a.b.c`` → ``a_b.c``) — the name the view was actually
        created under — so >2-part names resolve instead of always reading
        as absent."""
        if not self.spark.catalog.tableExists(".".join(_view_parts(name))):
            return None
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {_view_ident(name)}"
        ).collect()
        return {r["key"]: r["value"] for r in rows}

    def drop(self, name: str, purge: bool = False) -> None:
        """Remove ``name`` from the catalog (optionally deleting its data)
        and DROP any SQL view this catalog registered for it — a dangling
        view would keep serving the dropped table's pinned files until
        ``expire_snapshots``/``purge`` made it error out confusingly."""
        dropped: list[str] = []

        def _mut(m: dict):
            if name not in m:
                return None  # no-op; nothing to commit
            dropped.append(m.pop(name))
            return m

        self._cas(_mut)
        self._view_pins.pop(name, None)
        if dropped and self._view_for_table(name, dropped[-1]):
            self.spark.sql(f"DROP VIEW IF EXISTS {_view_ident(name)}")
        if purge and dropped:
            self.fs.delete_dir(dropped[-1])

    def _view_for_table(self, name: str, path: str) -> bool:
        """Does a session view named ``name`` serve the lake table at
        ``path``? Decided from the ``lake.path`` property STAMPED on the
        view, not this object's in-memory pins — so a drop removes views
        registered by any Catalog instance or handle in this session, and
        never drops an unrelated user view that happens to share the name."""
        # property read, not view_status: the table itself may already be
        # gone (concurrent purge) and must not block dropping its view
        props = self._view_props(name)
        return props is not None and \
            props.get("lake.path") == self.fs.normalize(path)

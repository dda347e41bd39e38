"""``spark.readStream.format("lake")`` — a Structured Streaming source over
the lake's snapshot log, built on PySpark 4's Python DataSource API.

Reference parity: the reference consumes Delta tables as streaming sources
via ``spark.readStream.format("delta")`` (Iceberg equivalently exposes an
incremental append scan); this module gives the engine's own table format
the same capability without any JVM extension. Semantics follow Iceberg's
streaming read, the industry contract for incremental table consumption:

* **Offsets are snapshot ids.** Offset ``{"snapshot_id": N}`` means
  "every snapshot ≤ N has been emitted"; a microbatch covers the
  snapshots in ``(start, end]``. Spark checkpoints offsets, so restarts
  resume exactly-once with no source-side state.
* **Append commits stream their added files.** The files added by an
  ``append`` snapshot are exactly the new rows, so each becomes one input
  partition read executor-side with pyarrow (Arrow RecordBatches — no
  per-row Python). File additions are computed from the per-bucket
  manifest DIFF of adjacent snapshots: O(touched buckets) metadata, never
  a full file listing.
* **Row-preserving reorganizations are invisible.** ``compact`` commits
  (plain, re-bucket, z-order — all run through ``compact``) rewrite
  already-streamed rows into new files; streaming them would double-read,
  so they are always skipped, like Iceberg's replace-snapshot skip.
* **Row-CHANGING commits fail loudly by default.** ``overwrite`` /
  ``update`` / ``delete`` / ``merge`` break append-only semantics — a
  file-level source cannot express them as row deltas (use
  :meth:`LakeTable.changes` for keyed row-level diffs). Default is the
  safe loud error; ``onDataChange=skip`` opts into ignoring them
  (Iceberg's ``streaming-skip-overwrite-snapshots``).

Scale shape: ``latestOffset`` is one metadata read of the log;
``partitions`` reads only the manifests of buckets the commit touched;
each data file is one partition so read parallelism tracks commit width.
``maxSnapshotsPerTrigger`` bounds a microbatch (admission control) for
continuous (default / processing-time) triggers, taking effect from the
second planned batch. It never caps the FIRST ``latestOffset`` answer
after reader construction: under ``Trigger.AvailableNow`` Spark pins the
whole run's end offset at that answer, so capping it would silently
truncate the run short of the log head (a restarted availableNow tail
would stop ``maxSnapshots`` past its checkpoint) — an availableNow run
therefore drains the full backlog regardless of the cap. For continuous
triggers that need the FIRST batch bounded too (deep-backlog catch-up
after a restart), opt in with ``capInitialBatch=true`` — incompatible
with availableNow by construction (it re-creates exactly the truncation
described above, which can be used deliberately as a bounded drain step).

Retention interaction: a stream lagging behind ``expire_snapshots``
(which prunes old log versions) fails with an explicit error naming the
missing snapshot — same contract as Delta/Iceberg when the retention
window outruns a consumer.

The DataSource python worker has no SparkSession, so table metadata is
read with the pure-Python :class:`~..lake.fs.LocalFilesystem`; local
paths (and ``file://``) only — remote object stores would need an
fsspec-backed filesystem here, not a Spark one. [No reference file
implements this; cdm-data-loader-utils delegates to Delta's JVM source.]
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..lake.fs import LocalFilesystem
from ..lake.table import _META_COLS, META_DELETED, LakeTable

# snapshot operations that add no NEW rows (compact covers re-bucket and
# z-order rewrites too) — always invisible to the stream
_ROW_PRESERVING = {"create", "compact"}
# operations that change or remove existing rows — append-only semantics
# cannot represent them; fail (default) or skip per onDataChange
_ROW_CHANGING = {"overwrite", "update", "delete", "merge", "rollback"}


def _local_path(raw: str) -> str:
    if raw.startswith("file://"):
        return raw[len("file://"):]
    if "://" in raw:
        raise ValueError(
            f"format('lake') metadata runs in a plain-Python worker and "
            f"supports local paths only, got {raw!r} (read remote tables "
            f"through LakeTable.read instead)"
        )
    return raw


def _meta_table(path: str) -> LakeTable:
    """Metadata-only handle: log + manifests via pure-Python file IO —
    every LakeTable method used here (snapshot/files/_read_manifest) is
    driver/worker-side metadata code that never touches self.spark."""
    return LakeTable(None, _local_path(path), fs=LocalFilesystem())


# diagnostic hook for drain-stall hunts: armed once at import (the env var
# is inherited by executor workers at fork), so the latestOffset/partitions
# hot path pays a single falsy check per call instead of an os.environ read
_TRACE_FILE = os.environ.get("LAKE_SOURCE_TRACE")


def _trace(msg: str) -> None:
    if _TRACE_FILE:
        with open(_TRACE_FILE, "a") as f:
            f.write(f"pid={os.getpid()} {msg}\n")


def _opt(options: dict, name: str, default: str | None = None) -> str | None:
    # Python data source options arrive lower-cased from SQL conf paths but
    # verbatim from .option() calls — accept either spelling
    return options.get(name, options.get(name.lower(), default))


def _snapshot_or_retention_error(table: LakeTable, sid: int) -> dict:
    try:
        return table.snapshot(sid)
    except FileNotFoundError as e:
        raise RuntimeError(
            f"lake stream needs snapshot {sid} of {table.path} but its log "
            f"entry is gone — expire_snapshots outran this consumer "
            f"(raise keep_last / grace_seconds, or restart the stream "
            f"without the stale checkpoint)"
        ) from e


def _added_files(table: LakeTable, snap: dict) -> list[tuple[str, int, int]]:
    """(rel_path, schema_id, rows) of files added by ``snap`` vs its
    parent, via the per-bucket manifest diff (O(touched buckets))."""
    parent_id = snap.get("parent_id")
    if parent_id is None:
        old_manifests: dict = {}
        old_files = set()
    else:
        parent = _snapshot_or_retention_error(table, int(parent_id))
        if "manifests" not in parent or "manifests" not in snap:
            # format-v1 snapshot on either side: inline file lists, diff whole
            old_files = {f.path for f in table.files(parent)}
            return [
                (f.path, f.schema_id, f.rows)
                for f in table.files(snap) if f.path not in old_files
            ]
        old_manifests = parent["manifests"]
        old_files = None  # computed per changed bucket below
    out: list[tuple[str, int, int]] = []
    for bucket_key, manifest in snap.get("manifests", {}).items():
        if old_manifests.get(bucket_key) == manifest:
            continue  # untouched bucket: identical immutable manifest
        prev = old_manifests.get(bucket_key)
        prev_paths = (
            {f.path for f in table._read_manifest(prev)} if prev else set()
        ) if old_files is None else old_files
        out.extend(
            (f.path, f.schema_id, f.rows)
            for f in table._read_manifest(manifest)
            if f.path not in prev_paths
        )
    return out


class LakeFilePartition(InputPartition):
    def __init__(self, root: str, rel_path: str, rows: int):
        self.root = root
        self.rel_path = rel_path
        self.rows = rows


def _read_file_batches(root: str, rel_path: str,
                       schema: T.StructType) -> Iterator:
    """One data file → Arrow RecordBatches aligned to the query schema:
    project the schema's columns, null-fill columns the file predates
    (schema evolution), drop meta columns, filter tombstoned rows, cast to
    the exact Arrow types Spark expects. Vectorized end-to-end."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    pf = pq.ParquetFile(os.path.join(root, rel_path))
    avail = set(pf.schema_arrow.names)
    want = [f.name for f in schema.fields]
    read_cols = [c for c in want if c in avail]
    if META_DELETED in avail:
        read_cols.append(META_DELETED)
    for batch in pf.iter_batches(columns=read_cols):
        tbl = pa.Table.from_batches([batch])
        if META_DELETED in avail:
            mask = pc.fill_null(tbl.column(META_DELETED), False)
            tbl = tbl.filter(pc.invert(mask)).drop_columns([META_DELETED])
        for name in want:
            if name not in avail:
                tbl = tbl.append_column(
                    name, pa.nulls(tbl.num_rows, target.field(name).type)
                )
        tbl = tbl.select(want).cast(target)
        yield from tbl.to_batches()


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._path = _local_path(_opt(options, "path") or "")
        if not self._path:
            raise ValueError("format('lake') requires a path")
        self._on_change = (_opt(options, "onDataChange", "fail") or "fail").lower()
        if self._on_change not in ("fail", "skip"):
            raise ValueError(
                f"onDataChange must be 'fail' or 'skip', got {self._on_change!r}")
        raw_start = _opt(options, "startingSnapshotId", "earliest") or "earliest"
        self._starting = raw_start.lower() if isinstance(raw_start, str) else raw_start
        mx = _opt(options, "maxSnapshotsPerTrigger")
        self._max_snaps = int(mx) if mx else None
        # admission-control anchor: end offset of the last planned batch.
        # None until partitions() first runs (e.g. right after a restart,
        # where the true start lives in the checkpoint).
        self._last_end: int | None = None
        # The FIRST latestOffset call after construction must report the
        # TRUE latest, never the admission-capped one: under
        # Trigger.AvailableNow, Spark's wrapper pins the whole run's end
        # offset at that first answer — a capped first answer silently
        # truncates the run (observed: a restarted availableNow tail
        # stopped maxSnapshots past the checkpoint and never reached the
        # log head, because recovery re-plans the last batch's partitions
        # BEFORE asking for the new latest, arming _last_end).
        self._first_latest = True
        # capInitialBatch=true opts the first batch INTO the cap — for
        # continuous (default / processing-time) triggers where a restart
        # against a deep backlog would otherwise plan one unbounded
        # catch-up batch. Do NOT combine with Trigger.AvailableNow unless
        # you want exactly that truncation as a bounded drain step (the
        # run stops maxSnapshots past the checkpoint; the next run
        # resumes there).
        self._cap_initial = (
            (_opt(options, "capInitialBatch", "false") or "false").lower()
            == "true"
        )
        # "latest" is pinned NOW, at stream creation — initialOffset() is
        # only invoked at first-batch planning, by which time concurrent
        # commits may have advanced the log, and re-reading it there would
        # silently drop every commit in between (observed in testing)
        if self._starting == "latest":
            self._starting = str(self._table().snapshot_id + 1)
        if self._cap_initial:
            # arm the anchor NOW: Spark may poll latestOffset before ever
            # calling initialOffset, and an unarmed anchor means an
            # uncapped first batch — the exact thing this option disables.
            # On a restart the true start lives in the checkpoint; the
            # recovery partitions() call re-arms the anchor there, and an
            # interim too-low answer just means one empty poll.
            self._last_end = (
                0 if self._starting == "earliest" else int(self._starting) - 1
            )

    def _table(self) -> LakeTable:
        return _meta_table(self._path)

    def initialOffset(self) -> dict:
        _trace("INITIAL")
        if self._starting == "earliest":
            sid = 0
        else:
            # inclusive: the named snapshot is the first one emitted
            sid = int(self._starting) - 1
        if self._cap_initial:
            # arm the admission anchor so a FRESH stream's first batch is
            # bounded too (restarts are armed by recovery partitions())
            self._last_end = sid
        return {"snapshot_id": sid}

    def latestOffset(self) -> dict:
        latest = self._table().snapshot_id
        _trace(f"LATEST raw={latest} first={self._first_latest} last_end={self._last_end}")
        if self._first_latest and not self._cap_initial:
            self._first_latest = False
        elif self._max_snaps is not None and self._last_end is not None:
            latest = min(latest, self._last_end + self._max_snaps)
        _trace(f"LATEST -> {latest}")
        return {"snapshot_id": latest}

    def partitions(self, start: dict, end: dict) -> list[LakeFilePartition]:
        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        _trace(f"PARTS {lo}->{hi}")
        self._last_end = hi
        table = self._table()
        parts: list[LakeFilePartition] = []
        for sid in range(lo + 1, hi + 1):
            snap = _snapshot_or_retention_error(table, sid)
            op = snap.get("operation")
            if op in _ROW_PRESERVING:
                continue
            if op in _ROW_CHANGING:
                if self._on_change == "skip":
                    continue
                raise RuntimeError(
                    f"lake stream on {self._path}: snapshot {sid} is a "
                    f"{op!r} commit, which changes existing rows — an "
                    f"append-only stream cannot represent it. Use "
                    f"LakeTable.changes() for row-level diffs, or "
                    f"option('onDataChange', 'skip') to ignore such commits"
                )
            parts.extend(
                LakeFilePartition(table.path, rel, rows)
                for rel, _schema_id, rows in _added_files(table, snap)
            )
        return parts

    def read(self, partition: LakeFilePartition) -> Iterator:
        return _read_file_batches(partition.root, partition.rel_path,
                                  self._schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; the log is immutable

    def stop(self) -> None:
        pass


class LakeBatchReader(DataSourceReader):
    """``spark.read.format("lake")`` — one partition per live data file of
    the chosen snapshot (``snapshotId`` / ``tag`` options, default
    current). Handle-free parity with ``LakeTable.read``; prefer the
    latter on a driver with a session (it adds stats/bucket pruning)."""

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._path = _local_path(_opt(options, "path") or "")
        if not self._path:
            raise ValueError("format('lake') requires a path")
        self._snapshot_id = _opt(options, "snapshotId")
        self._tag = _opt(options, "tag")

    def partitions(self) -> list[LakeFilePartition]:
        table = _meta_table(self._path)
        snap = table.snapshot(
            int(self._snapshot_id) if self._snapshot_id else None,
            tag=self._tag,
        )
        return [
            LakeFilePartition(table.path, f.path, f.rows)
            for f in table.files(snap)
        ]

    def read(self, partition: LakeFilePartition | None) -> Iterator:
        if partition is None:
            # Spark substitutes [None] when partitions() returns an empty
            # list (plan_data_source_read.py) — an empty snapshot has no
            # files, so the single None partition yields no rows
            return iter(())
        return _read_file_batches(partition.root, partition.rel_path,
                                  self._schema)


class LakeDataSource(DataSource):
    """Register with :func:`register_lake_source`; then
    ``spark.readStream.format("lake").load(path)`` streams a table's
    appends and ``spark.read.format("lake").load(path)`` reads a
    snapshot."""

    @classmethod
    def name(cls) -> str:
        return "lake"

    def schema(self) -> T.StructType:
        table = _meta_table(_opt(self.options, "path") or "")
        sid = _opt(self.options, "snapshotId")
        tag = _opt(self.options, "tag")
        snap = table.snapshot(int(sid) if sid else None, tag=tag)
        full = table.schema(snap)
        return T.StructType(
            [f for f in full.fields if f.name not in _META_COLS]
        )

    def streamReader(self, schema: T.StructType) -> LakeStreamReader:
        return LakeStreamReader(schema, dict(self.options))

    def reader(self, schema: T.StructType) -> LakeBatchReader:
        return LakeBatchReader(schema, dict(self.options))


def register_lake_source(spark) -> None:
    """Idempotently register the ``lake`` format on this session."""
    spark.dataSource.register(LakeDataSource)

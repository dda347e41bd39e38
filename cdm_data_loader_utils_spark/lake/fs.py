"""Pluggable filesystem layer for the lake-table format.

The snapshot log and data-file maintenance need a handful of *metadata*
operations (list, read/write a small JSON, delete, atomic-exclusive commit).
Round 1 hard-wired these to POSIX ``os`` calls, which confines the table to a
single node. This module routes them through a small interface with two
implementations:

* :class:`LocalFilesystem` — plain-path tables; atomic commit via the
  write-tmp-then-``os.link`` trick (content-complete AND create-exclusive).
* :class:`HadoopFilesystem` — any URI Hadoop can mount (``hdfs://``,
  ``s3a://``, ``file://``, ``abfs://`` …) through Spark's JVM gateway, i.e.
  the exact FileSystem objects the executors already use. Atomic commit via
  write-tmp-then-``rename``: on HDFS ``rename`` atomically refuses an
  existing destination, which is the same primitive Delta's HDFSLogStore
  relies on. Object stores without atomic rename-if-absent (plain S3) plug a
  :class:`FileLockProvider` into ``HadoopFilesystem(lock_provider=…)`` for
  multi-writer commits (the role S3DynamoDBLogStore plays for Delta);
  single-writer pipelines (the reference's deployment shape,
  ``/root/reference/src/cdm_data_loader_utils/audit/run.py:33-114`` runs one
  loader at a time) are safe with no lock at all.

Everything *data-sized* (parquet rows) always moves through Spark itself —
this layer never reads or writes table data, only O(files-per-commit) names
and O(KB) manifests, so driver metadata cost stays flat at 100 TB.
"""

from __future__ import annotations

import json
import os
import posixpath
import shutil
import uuid
from typing import Iterator


def is_uri(path: str) -> bool:
    return "://" in path


_ALREADY_EXISTS_CLASSES = (
    "org.apache.hadoop.fs.FileAlreadyExistsException",
    "org.apache.hadoop.hdfs.protocol.AlreadyBeingCreatedException",
    "java.nio.file.FileAlreadyExistsException",
)


def _is_already_exists(e: Exception) -> bool:
    """True iff a py4j-wrapped JVM exception is a create-already-exists
    conflict (the lost-the-commit-race signal), by exception CLASS."""
    je = getattr(e, "java_exception", None)
    names = []
    if je is not None:
        try:
            j = je
            while j is not None:
                names.append(j.getClass().getName())
                j = j.getCause()
        except Exception:  # pragma: no cover - py4j introspection failure
            pass
    if any(n in _ALREADY_EXISTS_CLASSES for n in names):
        return True
    # HDFS RemoteException carries only the original class NAME in its
    # message; match the fully-qualified class token, not bare "exist"
    text = str(e)
    return any(cls in text for cls in _ALREADY_EXISTS_CLASSES)


def filesystem_for(spark, path: str):
    """Pick the filesystem implementation for a table root path."""
    if is_uri(path):
        return HadoopFilesystem(spark, path)
    return LocalFilesystem()


class LocalFilesystem:
    """POSIX implementation — the fast path for plain local paths."""

    def normalize(self, path: str) -> str:
        return os.path.abspath(path)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def list_names(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def walk_files(self, path: str) -> Iterator[str]:
        for root, _dirs, files in os.walk(path):
            for fn in files:
                yield os.path.join(root, fn)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_exclusive(self, path: str, data: str) -> None:
        """Write full content, then atomically link into place.

        ``os.link`` fails with FileExistsError if a concurrent writer won the
        race — readers can never observe a partial file."""
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def rename_exclusive(self, src: str, dst: str) -> bool:
        """Atomically claim ``src`` by moving it to a caller-unique ``dst``;
        False if another claimer won (src already gone). Exactly one of N
        concurrent claimers succeeds: rename removes src atomically, so every
        later rename fails ENOENT. (dst is unique per claimer, so POSIX
        rename's clobber-dst semantics never engage.)"""
        try:
            os.rename(src, dst)
            return True
        except (FileNotFoundError, NotADirectoryError):
            return False

    def delete_dir(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def mtime_ms(self, path: str) -> int:
        return int(os.stat(path).st_mtime * 1000)

    def spark_path(self, path: str) -> str:
        """Form of ``path`` that ``spark.read`` / ``df.write`` accept."""
        return path

    def fs_path(self, path: str) -> str:
        """Plain path component (what a decoded ``input_file_name`` yields)."""
        return path


class FileLockProvider:
    """Advisory mutual-exclusion locks over any filesystem with atomic
    create-exclusive — the pluggable seam that makes MULTI-writer commits
    safe on stores whose own ``create(overwrite=false)`` is not atomic
    (plain S3). Delta solves this with S3DynamoDBLogStore and Iceberg with a
    lock-manager; here any coordination store reachable through an ``fs``
    object works (a shared POSIX/NFS dir, HDFS, or a custom fs impl backed
    by a real lock service).

    Locks are (name → lock file) with a TTL: a crashed holder's lock is
    reclaimed once its mtime is older than ``ttl_seconds``. Reclaim uses the
    same create-exclusive primitive, so two reclaimers cannot both win."""

    def __init__(self, fs, lock_dir: str, ttl_seconds: float = 300.0):
        self.fs = fs
        self.dir = lock_dir
        self.ttl = ttl_seconds
        fs.mkdirs(lock_dir)

    def _path(self, name: str) -> str:
        safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in name)
        return self.fs.join(self.dir, f"{safe}.lock")

    def acquire(self, name: str, timeout: float = 30.0) -> dict:
        """Returns a token carrying (path, holder id). Stale-lock reclaim is
        ATOMIC: the stale file is claimed by renaming it to a unique
        tombstone name — exactly one of N waiters wins the rename, so two
        waiters can never both proceed to create (delete-then-create would
        let waiter B delete waiter A's FRESH lock after A reclaimed first).
        Stat/delete failures of any kind (py4j wraps JVM FileNotFound in
        Py4JJavaError, not Python's FileNotFoundError) are treated as
        'state changed, re-examine' until the timeout."""
        import time as _t

        path = self._path(name)
        holder = uuid.uuid4().hex
        deadline = _t.monotonic() + timeout
        delay = 0.05
        while True:
            try:
                self.fs.write_text_exclusive(path, json.dumps(
                    {"holder": holder, "acquired_ms": int(_t.time() * 1000)}
                ))
                return {"path": path, "holder": holder}
            except FileExistsError:
                now_ms = int(_t.time() * 1000)
                try:
                    age_ms = now_ms - self.fs.mtime_ms(path)
                except Exception:
                    age_ms = None  # released/reclaimed between exists & stat
                if age_ms is not None and age_ms > self.ttl * 1000:
                    # Atomic reclaim: claim the stale file by renaming it to
                    # a waiter-unique tombstone (one winner), then VERIFY the
                    # tombed content really is stale — if the lock was
                    # reclaimed-and-recreated by someone else in our window,
                    # we renamed a FRESH lock and must put it back
                    # (create-exclusive restore). Remaining residual windows
                    # (a third waiter creating mid-restore; a fresh holder
                    # releasing while tombed, leaving a restored ownerless
                    # lock for one TTL) are documented; a CAS-backed lock
                    # provider (e.g. DynamoDB conditional put) closes them
                    # for stores that need absolute multi-writer safety.
                    tomb = f"{path}.reclaimed.{holder}"
                    if self.fs.rename_exclusive(path, tomb):
                        tdoc = None
                        try:
                            tdoc = json.loads(self.fs.read_text(tomb))
                        except Exception:  # corrupt/partial lock → reclaim
                            pass
                        fresh = (
                            tdoc is not None
                            and now_ms - int(tdoc.get("acquired_ms", 0))
                            <= self.ttl * 1000
                        )
                        if fresh:
                            try:
                                self.fs.write_text_exclusive(path, json.dumps(tdoc))
                            except FileExistsError:  # pragma: no cover
                                pass
                        try:
                            self.fs.delete(tomb)
                        except Exception:  # pragma: no cover
                            pass
                # ONE exit/backoff point: every failed iteration — fresh
                # lock, vanished lock, stat error, corrupt lock, lost
                # reclaim race — checks the deadline and sleeps, so no
                # state can turn acquire() into an untimeouted busy-loop
                if _t.monotonic() >= deadline:
                    raise TimeoutError(f"could not acquire lock {name!r} in {timeout}s")
                _t.sleep(delay)
                delay = min(delay * 2, 1.0)

    def release(self, token: dict) -> None:
        """Delete the lock ONLY if this token still holds it — a holder whose
        critical section outlived the TTL must not delete the reclaiming
        writer's fresh lock."""
        try:
            doc = json.loads(self.fs.read_text(token["path"]))
            if doc.get("holder") != token["holder"]:
                return  # reclaimed by someone else; not ours to delete
            self.fs.delete(token["path"])
        except Exception:  # pragma: no cover - already reclaimed/released
            pass


class HadoopFilesystem:
    """Hadoop FileSystem implementation via Spark's JVM gateway.

    Works for every scheme on the cluster's classpath; the driver calls the
    same FileSystem code the executors use, so a table created at
    ``hdfs://nn/warehouse/t`` needs zero repo changes. Only metadata-scale
    traffic crosses py4j (file names + small JSON manifests).

    ``lock_provider`` (a :class:`FileLockProvider` or compatible) turns
    commit exclusivity from create-exclusive into lock + check + write —
    required for MULTI-writer tables on stores without atomic
    create-if-absent (plain S3); leave None everywhere else (HDFS/local
    rename-free create-exclusive is already atomic and lock-free)."""

    def __init__(self, spark, base_uri: str, lock_provider=None):
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._Path(base_uri).getFileSystem(self._conf)
        self.lock_provider = lock_provider

    def _p(self, path: str):
        return self._Path(path)

    def normalize(self, path: str) -> str:
        return path.rstrip("/")

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def list_names(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def walk_files(self, path: str) -> Iterator[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return
        it = self._fs.listFiles(p, True)  # recursive RemoteIterator
        while it.hasNext():
            yield it.next().getPath().toString()

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            # commons-io ships with hadoop-client; one call instead of a
            # byte-array loop across py4j
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_exclusive(self, path: str, data: str) -> None:
        """Exclusive commit via ``create(path, overwrite=false)`` — the
        claim on the target name is a SINGLE atomic namenode op on HDFS
        (and a single create-exclusive call on local), unlike
        check-then-rename whose two steps race on filesystems where rename
        clobbers. Content is streamed after the claim, so a concurrent
        reader may glimpse a partial file — every manifest/snapshot read
        goes through :func:`read_json_with_retry` for exactly this reason.
        Object stores without atomic create-if-absent (plain S3) need a
        ``lock_provider`` for MULTI-writer commits — the same caveat
        Delta/Iceberg solve with S3DynamoDBLogStore / a lock manager."""
        if self.lock_provider is not None:
            token = self.lock_provider.acquire(path)
            try:
                if self.exists(path):
                    raise FileExistsError(path)
                out = self._fs.create(self._p(path), True)
                try:
                    out.write(bytearray(data.encode("utf-8")))
                finally:
                    out.close()
                return
            finally:
                self.lock_provider.release(token)
        target = self._p(path)
        try:
            out = self._fs.create(target, False)  # overwrite=false: atomic claim
        except Exception as e:  # py4j wraps FileAlreadyExistsException
            # Match the EXCEPTION CLASS, not a message substring: Hadoop
            # errors like "Parent path does not exist" or lease messages
            # mentioning "existing" must surface as real infrastructure
            # failures, never be mistaken for a lost commit race. HDFS wraps
            # the class in a RemoteException whose str() carries the original
            # class name, so the string check covers the wrapped form.
            if _is_already_exists(e):
                raise FileExistsError(path) from e
            raise
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()

    def delete(self, path: str) -> None:
        self._fs.delete(self._p(path), False)

    def rename_exclusive(self, src: str, dst: str) -> bool:
        """Atomic claim-by-rename (Hadoop rename returns false when src is
        gone or dst exists — exactly one of N claimers wins)."""
        try:
            return bool(self._fs.rename(self._p(src), self._p(dst)))
        except Exception:
            return False

    def delete_dir(self, path: str) -> None:
        self._fs.delete(self._p(path), True)

    def mtime_ms(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._p(path)).getModificationTime())

    def spark_path(self, path: str) -> str:
        return path

    def fs_path(self, path: str) -> str:
        from urllib.parse import urlparse

        return urlparse(path).path if is_uri(path) else path


class VersionedJsonLog:
    """Append-only log of versioned JSON documents with atomic
    create-exclusive commits — the shared optimistic-concurrency primitive
    behind both the table snapshot log and the catalog manifest.

    Version slot and payload MUST derive from the same read when doing a
    read-modify-write: ``write_exclusive(v+1, doc)`` fails with
    FileExistsError if another writer claimed the slot first, and the caller
    retries from a fresh read (never from a fresh version listing alone —
    that pattern silently drops interleaved commits)."""

    def __init__(self, fs, dir_path: str, prefix: str = "v"):
        self.fs = fs
        self.dir = dir_path
        self.prefix = prefix

    def path(self, version: int) -> str:
        return self.fs.join(self.dir, f"{self.prefix}{version:020d}.json")

    def versions(self) -> list[int]:
        n = len(self.prefix)
        return sorted(
            int(f[n:-5]) for f in self.fs.list_names(self.dir)
            if f.startswith(self.prefix) and f.endswith(".json")
            and f[n:-5].isdigit()
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def read(self, version: int) -> dict:
        return read_json_with_retry(self.fs, self.path(version))

    def write_exclusive(self, version: int, doc) -> int:
        self.fs.write_text_exclusive(self.path(version), json.dumps(doc))
        return version


def read_json_with_retry(fs, path: str, attempts: int = 5) -> dict:
    """Read a manifest defensively: on stores whose create isn't
    content-atomic a reader could glimpse a partial file mid-commit; a parse
    failure here is retried briefly before surfacing."""
    import time

    last: Exception | None = None
    for i in range(attempts):
        try:
            return json.loads(fs.read_text(path))
        except json.JSONDecodeError as e:  # pragma: no cover - race window
            last = e
            time.sleep(0.05 * (i + 1))
    raise last  # pragma: no cover

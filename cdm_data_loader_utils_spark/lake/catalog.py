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
from .table import LakeTable

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

    def _write(self, tables: dict) -> None:
        self._cas(lambda m: {**m, **tables})

    # --------------------------------------------------------------- tables
    def table_path(self, name: str) -> str:
        """Default physical layout: dots become directory levels."""
        return self.fs.join(self.warehouse, *name.split("."))

    def register(self, name: str, path: str | None = None) -> str:
        p = path if path is not None else self.table_path(name)
        self._write({name: p})
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

    def drop(self, name: str, purge: bool = False) -> None:
        dropped: list[str] = []

        def _mut(m: dict):
            if name not in m:
                return None  # no-op; nothing to commit
            dropped.append(m.pop(name))
            return m

        self._cas(_mut)
        if purge and dropped:
            self.fs.delete_dir(dropped[-1])

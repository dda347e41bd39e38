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

import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .fs import filesystem_for, read_json_with_retry
from .table import LakeTable

_CATALOG_DIR = "_catalog"


class Catalog:
    """warehouse-rooted ``namespace.table`` → path registry."""

    def __init__(self, spark: SparkSession, warehouse: str, fs=None):
        self.spark = spark
        self.fs = fs if fs is not None else filesystem_for(spark, warehouse)
        self.warehouse = self.fs.normalize(warehouse)
        self.fs.mkdirs(self.fs.join(self.warehouse, _CATALOG_DIR))

    # ------------------------------------------------------------- manifest
    def _versions(self) -> list[int]:
        d = self.fs.join(self.warehouse, _CATALOG_DIR)
        return sorted(
            int(f[1:-5]) for f in self.fs.list_names(d)
            if f.startswith("v") and f.endswith(".json")
        )

    def _manifest_path(self, v: int) -> str:
        return self.fs.join(self.warehouse, _CATALOG_DIR, f"v{v:020d}.json")

    def _read(self) -> tuple[int, dict]:
        vs = self._versions()
        if not vs:
            return 0, {}
        m = read_json_with_retry(self.fs, self._manifest_path(vs[-1]))
        return vs[-1], m

    def _write(self, tables: dict, max_retries: int = 5) -> None:
        attempt = 0
        while True:
            v, cur = self._read()
            merged = dict(cur)
            merged.update(tables)
            try:
                self.fs.write_text_exclusive(
                    self._manifest_path(v + 1), json.dumps(merged)
                )
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
        # compare-and-swap: version AND payload come from the SAME read, so
        # a registration committed between read and write surfaces as a
        # FileExistsError and the retry re-derives from the fresh manifest
        # (deriving the payload from one read but the version slot from a
        # later listing would silently erase the interleaved registration)
        path = None
        attempt = 0
        while True:
            v, m = self._read()
            if name not in m:
                break
            path = m[name]
            m2 = {k: p for k, p in m.items() if k != name}
            try:
                self.fs.write_text_exclusive(
                    self._manifest_path(v + 1), json.dumps(m2)
                )
                break
            except FileExistsError:
                attempt += 1
                if attempt > 5:
                    raise
                time.sleep(0.05 * attempt)
        if purge and path is not None:
            self.fs.delete_dir(path)

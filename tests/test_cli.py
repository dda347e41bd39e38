"""CLI ops parity: every lifecycle operation an operator schedules from
cron has a command — mirrors the reference's one-console-script-per-
operation surface (``/root/reference/pyproject.toml:20-30``). Commands run
in-process via ``cli.main`` (``get_spark`` getOrCreate reuses the test
session); the spark-submit deployment path is covered separately by
``test_spark_submit.py``."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_data_loader_utils_spark.cli import main
from cdm_data_loader_utils_spark.lake.catalog import Catalog
from cdm_data_loader_utils_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)

CDC_SCHEMA = T.StructType(
    list(SCHEMA.fields)
    + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
)


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_cli_maintain_prints_plan_and_applies(spark, warehouse, capsys):
    path = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, path, SCHEMA, bucket_by="k", bucket_count=2)
    for wave in range(4):
        t.append(_df(spark, [(f"k{i}", i + wave * 10) for i in range(8)]))

    main(["maintain", "--table", path, "--max-files-per-bucket", "2"])
    plan = json.loads(capsys.readouterr().out)
    assert plan["compact_buckets"], "4 appends x 2 buckets must exceed 2 files"
    assert plan["stats"]["rows"] == 32

    main(["maintain", "--table", path, "--max-files-per-bucket", "2",
          "--apply", "--keep-snapshots", "1", "--grace-seconds", "0"])
    out = capsys.readouterr().out
    assert "applied:" in out and "compacted" in out
    t2 = LakeTable.load(spark, path)
    assert t2.maintenance_plan(max_files_per_bucket=2)["compact_buckets"] == []
    assert {(r.k, r.v) for r in t2.read().collect()} == {
        (f"k{i}", i + w * 10) for i in range(8) for w in range(4)
    }


def test_cli_maintain_apply_rebucket(spark, warehouse, capsys):
    path = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, path, SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, [(f"k{i}", i) for i in range(64)]))
    main(["maintain", "--table", path, "--apply-rebucket",
          "--target-rows-per-bucket", "4", "--grace-seconds", "0"])
    out = capsys.readouterr().out
    assert "rebucketed to" in out
    t2 = LakeTable.load(spark, path)
    assert int(t2.snapshot()["bucket_count"]) >= 16
    assert t2.read().count() == 64


def test_cli_replicate_bootstrap_incremental_noop(spark, warehouse, capsys):
    src_path = os.path.join(warehouse, "src")
    dst_path = os.path.join(warehouse, "dst")
    state = os.path.join(warehouse, "state")
    src = LakeTable.create(spark, src_path, SCHEMA, bucket_by="k",
                           bucket_count=4)
    src.merge_cdc(spark.createDataFrame(
        [("a", 1, "i", 1), ("b", 2, "i", 2)], CDC_SCHEMA), key_cols=["k"])

    args = ["replicate", "--src", src_path, "--dst", dst_path,
            "--key-cols", "k", "--state-dir", state]
    main(args)  # bootstrap: creates dst with src's schema + layout
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["mode"] == "reconcile" and r1["events"] == 2
    dst = LakeTable.load(spark, dst_path)
    assert {(r.k, r.v) for r in dst.read().collect()} == {("a", 1), ("b", 2)}
    assert dst.snapshot()["bucket_by"] == "k"

    src.merge_cdc(spark.createDataFrame(
        [("c", 3, "i", 3)], CDC_SCHEMA), key_cols=["k"])
    main(args)
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["mode"] == "incremental" and r2["events"] == 1

    main(args)
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["mode"] == "noop"


def test_cli_refresh_views(spark, warehouse, capsys):
    cat = Catalog(spark, warehouse)
    t = cat.create_table("cv.t", SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    cat.register_views()

    main(["refresh-views", "--warehouse", warehouse])
    assert "all views current" in capsys.readouterr().out

    other = LakeTable.load(spark, cat.resolve("cv.t"))
    other.append(_df(spark, [("c", 3)]))
    main(["refresh-views", "--warehouse", warehouse])
    assert "re-pointed 1 view(s): cv.t" in capsys.readouterr().out
    assert spark.sql("SELECT count(*) AS n FROM cv.t").collect()[0].n == 3


def test_cli_unknown_command_exits(capsys):
    with pytest.raises(SystemExit):
        main(["no-such-command"])


def test_cli_rollback_by_tag_and_arg_validation(spark, warehouse, capsys):
    path = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, path, SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    t.tag("rel")
    t.overwrite(_df(spark, [("c", 3)]))

    main(["rollback", "--table", path, "--tag", "rel"])
    assert "rolled back" in capsys.readouterr().out
    assert {(r.k, r.v) for r in LakeTable.load(spark, path).read().collect()} \
        == {("a", 1), ("b", 2)}

    with pytest.raises(SystemExit):
        main(["rollback", "--table", path])  # neither target given
    with pytest.raises(SystemExit):
        main(["rollback", "--table", path, "--snapshot-id", "1",
              "--tag", "rel"])  # both given

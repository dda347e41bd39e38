"""``format("lake")`` Python DataSource: batch snapshot reads and the
append-only Structured Streaming source over the snapshot log (Iceberg
streaming-read semantics: offsets = snapshot ids, compaction invisible,
row-changing commits loud by default, retention lag explicit)."""

from __future__ import annotations

import datetime
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_data_loader_utils_spark.lake.table import LakeTable
from cdm_data_loader_utils_spark.streaming.lake_source import (
    register_lake_source,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def _rows(n, base=0):
    return [
        (f"k{base + i:05d}", base + i,
         datetime.datetime(2026, 1, 1, 0, 0, (base + i) % 60))
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(autouse=True)
def _register(spark):
    register_lake_source(spark)
    register_lake_source(spark)  # idempotent


def _wait(q, pred, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.exception() is not None:
            raise q.exception()
        if pred():
            return
        time.sleep(0.25)
    raise AssertionError(f"stream condition not reached in {timeout}s")


def _wait_error(q, match, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        e = q.exception()
        if e is not None:
            assert match in str(e), str(e)
            return
        time.sleep(0.25)
    raise AssertionError(f"stream did not fail within {timeout}s")


# ----------------------------------------------------------------- batch
def test_batch_format_reads_snapshot_and_time_travel(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(30)))
    first = t.snapshot_id
    t.append(_df(spark, _rows(20, base=100)))

    got = spark.read.format("lake").load(t.path)
    assert got.count() == 50
    assert sorted(got.columns) == ["k", "ts", "v"]
    assert got.agg(F.sum("v")).collect()[0][0] == \
        t.read().agg(F.sum("v")).collect()[0][0]

    old = (
        spark.read.format("lake")
        .option("snapshotId", str(first)).load(t.path)
    )
    assert old.count() == 30

    t.tag("prod")
    tagged = spark.read.format("lake").option("tag", "prod").load(t.path)
    assert tagged.count() == 50


def test_batch_format_reads_empty_snapshot(spark, warehouse):
    """Zero data files → partitions() returns [] → Spark substitutes a
    single None partition (plan_data_source_read.py); read(None) must
    yield no rows instead of crashing."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    got = spark.read.format("lake").load(t.path)
    assert got.count() == 0
    assert sorted(got.columns) == ["k", "ts", "v"]


# ------------------------------------------------------------- streaming
def test_stream_catches_up_then_follows_appends(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(40)))
    t.append(_df(spark, _rows(25, base=100)))

    q = (
        spark.readStream.format("lake").load(t.path)
        .writeStream.format("memory").queryName("lk_follow")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _wait(q, lambda: spark.table("lk_follow").count() == 65)
        # mid-stream commit arrives incrementally
        t.append(_df(spark, _rows(10, base=200)))
        _wait(q, lambda: spark.table("lk_follow").count() == 75)
        got = spark.table("lk_follow")
        assert got.select(F.sum("v")).collect()[0][0] == \
            t.read().select(F.sum("v")).collect()[0][0]
        assert got.select("k").distinct().count() == 75  # no duplicates
    finally:
        q.stop()


def test_stream_restart_is_exactly_once(spark, warehouse, tmp_path):
    """Stop the query, commit more, restart from the SAME checkpoint (a
    durable parquet sink — the memory sink cannot recover a checkpoint):
    the source must resume at the checkpointed snapshot offset, emitting
    the new commit exactly once — 35 total rows, no replays, no gaps."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(20)))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        return (
            spark.readStream.format("lake").load(t.path)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def rows_written():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0  # sink dir not initialized yet

    q = start()
    try:
        _wait(q, lambda: rows_written() == 20)
    finally:
        q.stop()

    t.append(_df(spark, _rows(15, base=100)))
    q = start()
    try:
        _wait(q, lambda: rows_written() >= 35)
        time.sleep(1.5)
        got = spark.read.parquet(out)
        assert got.count() == 35  # exactly once: 20 + 15, nothing replayed
        assert got.select("k").distinct().count() == 35
    finally:
        q.stop()


def test_stream_skips_compaction_but_fails_on_merge(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(30)))
    t.append(_df(spark, _rows(30, base=100)))
    t.compact()  # row-preserving: must be invisible to the stream

    q = (
        spark.readStream.format("lake").load(t.path)
        .writeStream.format("memory").queryName("lk_cmp")
        .option("checkpointLocation", str(tmp_path / "c1"))
        .start()
    )
    try:
        _wait(q, lambda: spark.table("lk_cmp").count() >= 60)
        time.sleep(1.5)
        assert spark.table("lk_cmp").count() == 60  # not re-emitted
        # a row-CHANGING commit mid-stream fails loudly
        upd = spark.createDataFrame(
            [("k00001", 999, datetime.datetime(2026, 2, 1), 5, "u")],
            T.StructType(SCHEMA.fields + [
                T.StructField("lsn", T.LongType()),
                T.StructField("op", T.StringType()),
            ]),
        )
        t.merge_cdc(upd, key_cols=["k"], lsn_col="lsn", op_col="op")
        _wait_error(q, "changes existing rows")
    finally:
        q.stop()

    # onDataChange=skip: same table streams end-to-end, merge invisible
    q2 = (
        spark.readStream.format("lake")
        .option("onDataChange", "skip").load(t.path)
        .writeStream.format("memory").queryName("lk_skip")
        .option("checkpointLocation", str(tmp_path / "c2"))
        .start()
    )
    try:
        _wait(q2, lambda: spark.table("lk_skip").count() >= 60)
        time.sleep(1.5)
        assert spark.table("lk_skip").count() == 60
    finally:
        q2.stop()


def test_stream_starting_latest_and_admission_control(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(50)))  # pre-existing: must NOT be emitted

    q = (
        spark.readStream.format("lake")
        .option("startingSnapshotId", "latest")
        .option("maxSnapshotsPerTrigger", "1")
        .load(t.path)
        .writeStream.format("memory").queryName("lk_latest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # wait until the first (empty) batch pinned the start offset, so
        # the appends below are unambiguously after-stream-start
        _wait(q, lambda: q.lastProgress is not None)
        for b in (100, 200, 300):
            t.append(_df(spark, _rows(5, base=b)))
        _wait(q, lambda: spark.table("lk_latest").count() == 15)
        assert spark.table("lk_latest").filter(F.col("v") < 100).count() == 0
        # maxSnapshotsPerTrigger=1 → the three commits cannot share a batch
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) >= 3, [p["numInputRows"] for p in batches]
    finally:
        q.stop()


def test_stream_null_fills_pre_evolution_files(spark, warehouse, tmp_path):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(10)))
    widened = T.StructType(SCHEMA.fields + [
        T.StructField("extra", T.DoubleType()),
    ])
    t.append(spark.createDataFrame(
        [(f"n{i}", i, datetime.datetime(2026, 3, 1), float(i))
         for i in range(5)], widened))

    q = (
        spark.readStream.format("lake").load(t.path)
        .writeStream.format("memory").queryName("lk_evo")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _wait(q, lambda: spark.table("lk_evo").count() == 15)
        got = spark.table("lk_evo")
        assert "extra" in got.columns
        assert got.filter(F.col("extra").isNull()).count() == 10
        assert got.filter(F.col("extra").isNotNull()).count() == 5
    finally:
        q.stop()


def test_stream_names_expired_snapshot_on_retention_lag(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    for b in (0, 100, 200):
        t.append(_df(spark, _rows(5, base=b)))
    t.expire_snapshots(keep_last=1, grace_seconds=0)

    from cdm_data_loader_utils_spark.streaming.lake_source import (
        LakeStreamReader,
    )
    r = LakeStreamReader(SCHEMA, {"path": t.path})
    with pytest.raises(RuntimeError, match="expire_snapshots outran"):
        r.partitions({"snapshot_id": 1}, {"snapshot_id": t.snapshot_id})


def test_remote_uri_rejected_loudly():
    from cdm_data_loader_utils_spark.streaming.lake_source import (
        LakeStreamReader,
    )
    with pytest.raises(ValueError, match="local paths only"):
        LakeStreamReader(SCHEMA, {"path": "s3a://bucket/t"})


def test_stream_sees_rollback_as_row_changing(spark, warehouse):
    """A rollback restores removed rows — append-only streams cannot
    express it: fail loudly by default, invisible with onDataChange=skip
    (same contract as merge/delete)."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(10)))
    good = t.snapshot_id
    t.append(_df(spark, _rows(5, base=100)))
    t.rollback_to(good)

    from cdm_data_loader_utils_spark.streaming.lake_source import (
        LakeStreamReader,
    )
    r = LakeStreamReader(SCHEMA, {"path": t.path})
    with pytest.raises(RuntimeError, match="rollback"):
        r.partitions({"snapshot_id": good}, {"snapshot_id": t.snapshot_id})
    # skip mode: the rollback commit itself is invisible — the range's
    # only streamed rows are the intervening append's 5
    r2 = LakeStreamReader(SCHEMA, {"path": t.path, "onDataChange": "skip"})
    parts = r2.partitions({"snapshot_id": good},
                          {"snapshot_id": t.snapshot_id})
    assert sum(p.rows for p in parts) == 5


def test_availablenow_restart_with_admission_cap_drains_to_head(spark, warehouse, tmp_path):
    """Regression: a restarted AvailableNow run must drain to the log HEAD
    even with maxSnapshotsPerTrigger set. Spark pins the run's end at the
    reader's first latestOffset answer; a capped first answer silently
    stopped the run maxSnapshots past the checkpoint."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(10)))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("lake")
            .option("maxSnapshotsPerTrigger", "1").load(t.path)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 10
    for b in (100, 200, 300, 400):  # 4 commits > the 1-snapshot cap
        t.append(_df(spark, _rows(5, base=b)))
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 30  # head reached: all 4 post-restart commits
    assert got.select("k").distinct().count() == 30


def test_cap_initial_batch_bounds_continuous_catchup(spark, warehouse, tmp_path):
    """capInitialBatch=true: a continuous-trigger stream starting against a
    backlog plans its FIRST batch admission-capped instead of unbounded."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    for b in (0, 100, 200):
        t.append(_df(spark, _rows(5, base=b)))

    q = (
        spark.readStream.format("lake")
        .option("maxSnapshotsPerTrigger", "1")
        .option("capInitialBatch", "true")
        .load(t.path)
        .writeStream.format("memory").queryName("lk_cap")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _wait(q, lambda: spark.table("lk_cap").count() == 15)
        # progress entries flush asynchronously — poll for them
        _wait(q, lambda: len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3,
            timeout=30)
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        # one snapshot per batch: the 3 backlog commits cannot share one
        assert len(batches) >= 3, [p["numInputRows"] for p in batches]
        assert max(p["numInputRows"] for p in batches) == 5  # capped batches
    finally:
        q.stop()

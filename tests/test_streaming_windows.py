"""Streaming windowed-agg + custom-stateful-operator tests: watermark late
drop (append mode) and GroupState accumulation across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdm_data_loader_utils_spark.schemas import CHANGE_EVENT_SCHEMA
from cdm_data_loader_utils_spark.streaming.windows import (
    conversation_progress,
    windowed_turn_counts,
)


def _event(lsn, conv, turn, ts_s):
    return (lsn, "i", conv, turn, "user", f"t{lsn}", None, ts_s, 0)


def _write_events(spark, path, rows):
    data = [
        (lsn, op, conv, turn, role, text, tool, bid, ts)
        for (lsn, op, conv, turn, role, text, tool, ts, bid) in rows
    ]
    df = spark.createDataFrame(
        data,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, batch_id long, ts_off long",
    ).select(
        "lsn", "op", "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("ts_off")).alias("ts"),
        "batch_id",
    )
    # the file-stream source tails FILES under src/, not nested directories:
    # write to a side dir and move the single part file into place
    import glob
    import shutil

    tmp_dir = path + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*.parquet"))[0]
    os.replace(part, path)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def _run_stream(spark, src_dir, ckpt, out_dir, transform, output_mode):
    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def _sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        transform(stream)
        .writeStream.foreachBatch(_sink)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermark_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # batch 1: conv A events in window [0,60) and one at t=600 that pushes
    # the max event time (and therefore the watermark) far ahead
    _write_events(
        spark,
        os.path.join(src, "f1.parquet"),
        [_event(1, "A", 0, 10), _event(2, "A", 1, 20), _event(3, "B", 0, 600)],
    )
    out = str(tmp_path / "out")
    _run_stream(
        spark, src, ckpt, out,
        lambda s: windowed_turn_counts(s, "1 minute", "2 minutes"),
        "append",
    )
    # batch 2 (same checkpoint): one in-time event and one LATE event for the
    # long-finalized [0,60) window — the watermark (600-120=480) must drop it
    _write_events(
        spark,
        os.path.join(src, "f2.parquet"),
        [_event(4, "B", 1, 610), _event(5, "A", 2, 30)],
    )
    _run_stream(
        spark, src, ckpt, out,
        lambda s: windowed_turn_counts(s, "1 minute", "2 minutes"),
        "append",
    )
    rows = spark.read.parquet(out).collect()
    a_rows = [r for r in rows if r.conv_id == "A"]
    # conv A's [0,60) window finalized with the ORIGINAL 2 events; the late
    # lsn=5 event (ts=30) arrived behind the watermark and was dropped
    assert len(a_rows) == 1 and a_rows[0].n_events == 2, rows


def test_stateful_progress_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_events(
        spark,
        os.path.join(src, "f1.parquet"),
        [_event(1, "A", 0, 10), _event(2, "A", 1, 20), _event(3, "B", 0, 30)],
    )
    out = str(tmp_path / "out")
    _run_stream(spark, src, ckpt, out, conversation_progress, "update")
    _write_events(
        spark,
        os.path.join(src, "f2.parquet"),
        [_event(9, "A", 2, 40)],
    )
    _run_stream(spark, src, ckpt, out, conversation_progress, "update")
    # take the LAST emitted row per conversation (update mode re-emits)
    all_rows = spark.read.parquet(out).collect()
    rows = {}
    for r in sorted(all_rows, key=lambda x: x.batches_seen):
        rows[r.conv_id] = r
    # second run processed only f2: state carried A's totals forward
    assert rows["A"].events_seen == 3
    assert rows["A"].max_lsn == 9
    assert rows["A"].batches_seen == 2
    assert rows["B"].events_seen == 1 and rows["B"].batches_seen == 1

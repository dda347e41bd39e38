"""Event-time windowed aggregation + custom stateful streaming operators.

The reference has no streaming runtime (its incremental loop is a batch
cron, ``/root/reference/src/cdm_data_loader_utils/parsers/refseq_pipeline/
cli/refseq_update_manager.py:58-235``); these operators are the Structured-
Streaming-native capabilities the north rule's tail→upsert engine needs
around the MERGE path:

* :func:`windowed_turn_counts` — watermarked event-time tumbling-window
  aggregation (append mode): per-window per-conversation event counts that
  finalize once the watermark passes the window end; late events beyond the
  watermark are dropped by the engine, not by user code.
* :func:`conversation_progress` — custom stateful operator via
  ``applyInPandasWithState``: running per-conversation totals (events seen,
  max LSN, distinct-turn high-water-mark estimate) carried in typed
  GroupState across micro-batches — the pattern for any accumulator the
  built-in aggs can't express.

Scale notes: both keep state partitioned by ``conv_id`` (the same key the
lake table buckets on), so state shards co-locate with merge work; the
watermark bounds state size — windows older than (watermark + window) are
evicted, which is what makes unbounded streams runnable forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROGRESS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)

PROGRESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)


def windowed_turn_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts per conversation with a watermark.

    On a stream, use ``outputMode("append")``: a window row is emitted
    exactly once, when the watermark passes its end; events arriving later
    than ``watermark`` behind the max seen event time are dropped. On a
    batch DataFrame the same expression computes the full history (used by
    the correctness gate)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "conv_id",
            "n_events",
            "max_lsn",
        )
    )


def conversation_progress(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-conversation progress totals.

    ``applyInPandasWithState`` keyed on ``conv_id``; state is a single typed
    row (events_seen, max_lsn, batches_seen) updated per micro-batch with
    vectorized pandas ops — no per-row Python. Output mode "update": one row
    per conversation per batch that touched it."""
    import pandas as pd

    def _update(key, pdfs, state):
        conv_id = key[0]
        events_seen, max_lsn, batches = 0, -1, 0
        if state.exists:
            events_seen, max_lsn, batches = state.get
        new_events, new_max = 0, max_lsn
        for pdf in pdfs:
            new_events += len(pdf)
            lsns = pd.to_numeric(pdf["lsn"], errors="coerce").dropna()
            if len(lsns):  # all-null lsn batch: keep the old watermark
                new_max = max(new_max, int(lsns.max()))
        events_seen += new_events
        batches += 1
        state.update((events_seen, new_max, batches))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "events_seen": [events_seen],
                "max_lsn": [new_max],
                "batches_seen": [batches],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("conv_id", "lsn")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            PROGRESS_OUTPUT_SCHEMA,
            PROGRESS_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )

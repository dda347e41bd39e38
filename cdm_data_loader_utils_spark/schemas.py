"""Schema registry for the CDC engine.

Schema-first design mirrors the reference's declared-``StructType`` discipline
(``/root/reference/src/cdm_data_loader_utils/readers/dsv.py:24-29``:
``inferSchema=False, enforceSchema=True``; audit schemas
``audit/schema.py:40-93``). One module owns every schema, like the reference's
schema catalog (``transformers/genome_depot/schema.py``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- target table (input_hint shape) -------------------------------------
# transcripts(conv_id string, turn_idx int, role string, text string,
#             tool string, ts timestamp); PK (conv_id, turn_idx).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

# transcripts schema as it exists before the `tool` schema-evolution wave
TRANSCRIPT_SCHEMA_V0 = T.StructType(
    [f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"]
)

# --- change-event envelope -------------------------------------------------
# binlog/WAL-style event; analogue of the reference's tagged hash-snapshot
# rows + derived change_type (hashes_snapshot.py:16-25, snapshot_utils.py:51-58)
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), nullable=False),
        T.StructField("op", T.StringType(), nullable=False),  # i|u|d
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=False),
        T.StructField("batch_id", T.LongType(), nullable=True),
    ]
)

VALID_OPS = ("i", "u", "d")

# --- audit tables ----------------------------------------------------------
# mirror of the reference audit schemas (audit/schema.py:50-93): run,
# checkpoint, metrics collapsed into one per-batch/per-partition lineage row.
INGEST_LOG_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), nullable=False),
        T.StructField("batch_id", T.LongType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("rows_read", T.LongType(), nullable=True),
        T.StructField("rows_valid", T.LongType(), nullable=True),
        T.StructField("rows_invalid", T.LongType(), nullable=True),
        T.StructField("rows_applied", T.LongType(), nullable=True),
        T.StructField("lsn_watermark", T.LongType(), nullable=True),
        T.StructField("partition_id", T.IntegerType(), nullable=True),
        T.StructField("snapshot_id", T.LongType(), nullable=True),
        T.StructField("updated", T.TimestampType(), nullable=False),
    ]
)

RUN_STATUS_RUNNING = "RUNNING"
RUN_STATUS_SUCCESS = "SUCCESS"
RUN_STATUS_ERROR = "ERROR"

# rejects: invalid-event capture (audit/schema.py:84-92; raw row kept as JSON
# like audit/rejects.py:73 `to_json(struct(*cols))`)
REJECTS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), nullable=False),
        T.StructField("batch_id", T.LongType(), nullable=True),
        T.StructField("raw_record", T.StringType(), nullable=True),
        T.StructField("errors_in_record", T.ArrayType(T.StringType()), nullable=True),
        T.StructField("timestamp", T.TimestampType(), nullable=False),
    ]
)

# runs: run-level status state machine (audit/schema.py:40-49 run table;
# transitions via targeted UPDATE, audit/run.py:33-114)
RUNS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("error", T.StringType(), nullable=True),
        T.StructField("started", T.TimestampType(), nullable=True),
        T.StructField("finished", T.TimestampType(), nullable=True),
    ]
)

ROW_ERRORS_COL = "errors_in_record"
CORRUPT_RECORD_COL = "__invalid_data__"  # cf. readers/dsv.py:16, core/constants.py:3


def schema_to_json(schema: T.StructType) -> str:
    return schema.json()


def schema_from_json(s: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(s))

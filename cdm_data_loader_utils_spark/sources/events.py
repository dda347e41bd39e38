"""Deterministic synthetic transcript CDC event generator.

Analogue of the reference's seeded test corpora (checked-in CSVs/golden files,
``/root/reference/tests/conftest.py:122-236``) but synthesized *lazily* as
pure Spark column expressions over ``spark.range`` — never materialized on the
driver — so the same generator produces the 10^4-row unit fixture and the
10^8+-row bench stream (SURVEY §7.2 hard part 5).

All pseudo-randomness is ``xxhash64(id, seed)``-derived: the stream is a pure
function of (n_events, seed, knobs), identical at any parallelism level.

Stream properties (FIXTURES.md §2):
* ops i/u/d with configurable rates;
* hot keys — ``hot_frac`` of conv_ids receive ``hot_share`` of events;
* bounded out-of-order delivery — events are assigned to micro-batches by a
  jittered delivery position (window ``ooo_window``), so a batch can contain
  LSNs both below and above its neighbors' ranges;
* ~``dup_rate`` duplicate events re-emitted verbatim in a later batch
  (idempotency fixture);
* schema wave — events with ``lsn < tool_from_lsn`` have no ``tool`` value;
  the replay harness drops the column entirely for early batches to exercise
  schema evolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 63-bit positive hash."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_change_events(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 100,
    turns_per_conv: int = 50,
    seed: int = 42,
    insert_rate: float = 0.65,
    delete_rate: float = 0.05,
    hot_frac: float = 0.01,
    hot_share: float = 0.30,
    ooo_window: int = 1000,
    dup_rate: float = 0.02,
    batch_size: int = 100_000,
    tool_from_lsn: int | None = None,
) -> DataFrame:
    """Return change_events(lsn, op, conv_id, turn_idx, role, text, tool, ts,
    batch_id) — schema per FIXTURES.md §2."""
    n_hot = max(1, int(n_convs * hot_frac))
    df = spark.range(0, n_events, 1).withColumnRenamed("id", "lsn")

    u_conv = (_h(seed + 1, "lsn") % 1_000_000) / 1_000_000.0
    hot_pick = (_h(seed + 2, "lsn") % n_hot).cast("int")
    cold_pick = (_h(seed + 3, "lsn") % n_convs).cast("int")
    conv_num = F.when(u_conv < hot_share, hot_pick).otherwise(cold_pick)
    df = df.withColumn("conv_id", F.format_string("conv-%08d", conv_num))
    df = df.withColumn(
        "turn_idx", (_h(seed + 4, "lsn") % turns_per_conv).cast("int")
    )

    u_op = (_h(seed + 5, "lsn") % 1_000_000) / 1_000_000.0
    df = df.withColumn(
        "op",
        F.when(u_op < delete_rate, F.lit("d"))
        .when(u_op < delete_rate + insert_rate, F.lit("i"))
        .otherwise(F.lit("u")),
    )
    role_idx = (_h(seed + 6, "lsn") % 4).cast("int")
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    df = df.withColumn("role", F.when(F.col("op") == "d", F.lit(None)).otherwise(roles[role_idx]))
    df = df.withColumn(
        "text",
        F.when(F.col("op") == "d", F.lit(None)).otherwise(
            F.format_string(
                "turn %d of %s rev-%d :: %s",
                F.col("turn_idx"), F.col("conv_id"), F.col("lsn"),
                F.sha2(F.concat_ws("|", F.lit(seed), F.col("lsn")), 256),
            )
        ),
    )
    if tool_from_lsn is None:
        tool_from_lsn = n_events  # no tool values at all by default
    df = df.withColumn(
        "tool",
        F.when(
            (F.col("lsn") >= tool_from_lsn)
            & (F.col("role") == "tool")
            & (F.col("op") != "d"),
            F.format_string("tool-%d", (_h(seed + 7, "lsn") % 8).cast("int")),
        ).otherwise(F.lit(None).cast("string")),
    )
    df = df.withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("lsn") + (_h(seed + 8, "lsn") % 3).cast("long")
        ),
    )
    # bounded out-of-order delivery position → micro-batch assignment
    delivery = F.col("lsn") + (_h(seed + 9, "lsn") % ooo_window).cast("long")
    df = df.withColumn("batch_id", (delivery / batch_size).cast("long"))

    # verbatim duplicates re-delivered one batch later
    dup_ppm = int(dup_rate * 1_000_000)
    dups = (
        df.filter((_h(seed + 10, "lsn") % 1_000_000) < dup_ppm)
        .withColumn("batch_id", F.col("batch_id") + 1)
    )
    df = df.unionByName(dups)

    return df.select(
        "lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "batch_id"
    )


def expected_final_state(events: DataFrame) -> DataFrame:
    """Spark-side oracle: global LWW fold over the *entire* event stream
    (ignores batching entirely) — what the table must equal after replay.

    Mirrors FIXTURES.md §5 (sort by lsn, fold, delete removes)."""
    from ..operators.lww import lww_dedup

    last = lww_dedup(events, ["conv_id", "turn_idx"], ["lsn", "ts"])
    return (
        last.filter(F.col("op") != "d")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )

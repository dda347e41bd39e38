"""Phase probes: simhash, lww, and the CDC replay path (guide §1)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdm_data_loader_utils_spark import queries as Q  # noqa: E402
from cdm_data_loader_utils_spark.operators import dedup as D  # noqa: E402
from cdm_data_loader_utils_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:34s} {time.perf_counter() - t0:7.2f}s  {out}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="replay-probe", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    d = Q.load(spark, sf_dir, "documents")
    d.count()

    # ---- simhash: fingerprints vs join vs distinct
    fps = D.simhash(d).persist()
    t("simhash fingerprints", lambda: fps.count())
    width = 60 // 4
    chunks = F.array(*[
        F.shiftright(F.col("simhash"), i * width).bitwiseAND(
            F.lit((1 << width) - 1)) for i in range(4)
    ])
    blocked = fps.select(
        "id", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).persist()
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    raw = a.join(
        b,
        (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
        & (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
             ham.alias("hamming"))
    t("simhash raw collide pairs", lambda: raw.count())
    t("simhash distinct-then-filter",
      lambda: raw.distinct().filter(F.col("hamming") <= 3).count())
    t("simhash filter-then-distinct",
      lambda: raw.filter(F.col("hamming") <= 3).distinct().count())

    # ---- lww_latest_turn: scan vs window vs agg
    ch = Q.events_as_changes(spark, sf_dir)
    t("events scan only", lambda: ch.write.format("noop").mode("overwrite").save())
    from cdm_data_loader_utils_spark.operators.lww import (
        lww_dedup, lww_dedup_agg,
    )
    win = lww_dedup(ch, ["conv_id", "turn_idx"], ["lsn", "ts"],
                    extra_tiebreak=None).filter(F.col("op") != "d").select(
        "conv_id", "turn_idx", "text", F.col("lsn").alias("last_lsn"))
    t("lww window form", lambda: win.count())
    t("lww window form warm", lambda: win.count())
    agg = lww_dedup_agg(ch, ["conv_id", "turn_idx"], ["lsn", "ts"],
                        extra_tiebreak=None).filter(F.col("op") != "d").select(
        "conv_id", "turn_idx", "text", F.col("lsn").alias("last_lsn"))
    t("lww agg form", lambda: agg.count())
    t("lww agg form warm", lambda: agg.count())
    # equality check
    import pandas as pd  # noqa: F401
    aw = {tuple(r) for r in win.collect()}
    ag = {tuple(r) for r in agg.collect()}
    print("lww window==agg:", aw == ag)

    # ---- cdc_replay_final_state timed per phase
    t0 = time.perf_counter()
    df = Q.q_cdc_replay_final_state(spark, sf_dir)
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = df.count()
    print(f"cdc_replay_final_state: build {build:.2f}s count {time.perf_counter()-t0:.2f}s rows={n}")


if __name__ == "__main__":
    main()

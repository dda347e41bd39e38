"""Pure-Spark scaling CONTROL for the N→4N efficiency measurement.

Runs the same data volume as a replay leg through scan → LWW-style hash
aggregate → bucketed parquet write using ONLY stock Spark (no lake format,
no snapshot log, no lineage/count jobs). Whatever efficiency THIS job shows
at two parallelism levels is the host's ceiling for shuffle+IO workloads —
the engine's efficiency is judged against it, not against an unreachable
1.0 (a single host shares memory bandwidth, L3 and disk across both legs;
a real 4N-executor cluster multiplies those by 4).

Prints one JSON line: {"cpus": N, "events": E, "sec": S, "events_per_sec": T}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdm_data_loader_utils_spark.session import get_spark  # noqa: E402
from cdm_data_loader_utils_spark.sources.events import generate_change_events  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    events = int(os.environ.get("BENCH_REPLAY_EVENTS", "8000000"))
    spark = get_spark(
        app_name="scaling-control", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="ctl_")
    try:
        generate_change_events(
            spark, events, n_convs=max(1000, events // 1000), seed=42,
            ooo_window=10_000, batch_size=max(1, events // 4),
        ).write.parquet(tmp + "/ev")
        ev = spark.read.parquet(tmp + "/ev")
        n = ev.count()
        t0 = time.perf_counter()
        (
            ev.groupBy("conv_id", "turn_idx")
            .agg(
                F.max_by(
                    F.struct("lsn", "ts", "op", "text", "role", "tool"),
                    F.struct("lsn", "ts"),
                ).alias("r")
            )
            .select("conv_id", "turn_idx", "r.*")
            .withColumn("__b", F.pmod(F.xxhash64("conv_id"), F.lit(64)).cast("int"))
            .repartition(64, "__b")
            .write.partitionBy("__b")
            .parquet(tmp + "/out")
        )
        dt = time.perf_counter() - t0
        print(json.dumps({
            "cpus": cpus, "events": n, "sec": round(dt, 2),
            "events_per_sec": int(n / dt),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Measure the stats-based file-skipping win on a range scan.

Builds a clustered lake table (bucketed + compact(sort_by=["ts"])) of
synthetic events, then times the same 1%-tail time-range query two ways:

* pruned  — ``read(where=[("ts", ">=", cutoff)])``: manifest-level file
  skipping BEFORE Spark lists anything, residual filter pushed to parquet;
* unpruned — ``read()`` over every live file with the identical filter
  applied afterwards (what every scan paid before round 3).

Also reports the file-count split from ``plan_files`` — the number that
actually matters at 100 TB, where "files not opened" is the whole game.

    python tools/bench_pruning.py [--rows 2000000] [--buckets 16]
                                  [--files-per-bucket 8] [--tail-frac 0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--files-per-bucket", type=int, default=8)
    ap.add_argument("--tail-frac", type=float, default=0.01)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cdm_data_loader_utils_spark.lake.table import LakeTable
    from cdm_data_loader_utils_spark.session import get_spark

    spark = get_spark(
        "bench-pruning", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_pruning_")
    try:
        # synthetic event rows with a monotone-ish ts column (epoch seconds)
        df = (
            spark.range(args.rows)
            .select(
                F.format_string("k-%012d", F.col("id")).alias("k"),
                F.col("id").alias("v"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id")
                ).alias("ts"),
            )
        )
        t = LakeTable.create(
            spark, os.path.join(tmp, "t"), df.schema,
            bucket_by="k", bucket_count=args.buckets,
        )
        t.append(df)
        t.compact(sort_by=["ts"], target_files_per_bucket=args.files_per_bucket)

        import datetime

        cutoff_s = 1_700_000_000 + int(args.rows * (1 - args.tail_frac))
        cutoff = datetime.datetime.utcfromtimestamp(cutoff_s)
        where = [("ts", ">=", cutoff)]
        scanned, skipped = t.plan_files(where=where)

        def timed(fn):
            best = []
            for _ in range(args.trials):
                t0 = time.monotonic()
                n = fn()
                best.append(time.monotonic() - t0)
            return min(best), n

        pruned_s, n1 = timed(lambda: t.read(where=where).count())
        unpruned_s, n2 = timed(
            lambda: t.read().filter(F.col("ts") >= F.lit(cutoff)).count()
        )
        assert n1 == n2, (n1, n2)
        print(json.dumps({
            "rows": args.rows,
            "tail_rows": n1,
            "files_total": len(scanned) + len(skipped),
            "files_scanned": len(scanned),
            "files_skipped": len(skipped),
            "pruned_sec": round(pruned_s, 3),
            "unpruned_sec": round(unpruned_s, 3),
            "speedup": round(unpruned_s / pruned_s, 2) if pruned_s > 0 else None,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

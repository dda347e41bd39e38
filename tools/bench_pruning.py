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
        # plus a random-order high-cardinality string column `u` for the
        # bloom point-lookup leg (uncorrelated with the ts sort, so neither
        # manifest stats nor row-group min/max can prune it — only blooms)
        df = (
            spark.range(args.rows)
            .select(
                F.format_string("k-%012d", F.col("id")).alias("k"),
                # v is SCRAMBLED relative to id/ts (Knuth multiplicative
                # hash) so it is genuinely uncorrelated with the ts sort —
                # the z-order leg needs a second independent dimension
                F.pmod(F.col("id") * F.lit(2654435761),
                       F.lit(args.rows)).alias("v"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id")
                ).alias("ts"),
                F.format_string("u-%016x", F.xxhash64(F.col("id"))).alias("u"),
            )
        )
        t = LakeTable.create(
            spark, os.path.join(tmp, "t"), df.schema,
            bucket_by="k", bucket_count=args.buckets,
            properties={"write.bloom.columns": ["u"]},
        )
        t.append(df)
        t.compact(sort_by=["ts"], target_files_per_bucket=args.files_per_bucket)

        import datetime

        cutoff_s = 1_700_000_000 + int(args.rows * (1 - args.tail_frac))
        # tz-AWARE cutoff: the pruner REFUSES to prune on a naive literal
        # against an instant column (driver-OS-tz ambiguity), so a naive
        # datetime here would silently measure 0 skipped files
        cutoff = datetime.datetime.fromtimestamp(cutoff_s, tz=datetime.timezone.utc)
        where = [("ts", ">=", cutoff)]
        scanned, skipped = t.plan_files(where=where)
        assert skipped, (
            "stats pruning skipped 0 files — regression in manifest "
            "min/max skipping or in the cutoff literal encoding"
        )

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

        # z-order leg: the same table clustered by zorder_by(ts, v) must
        # prune files for a RANGE PREDICATE ON v (uncorrelated with ts) that
        # the linear ts-sorted table cannot skip at all
        tz_ = LakeTable.create(
            spark, os.path.join(tmp, "tz"), df.schema,
            bucket_by="k", bucket_count=args.buckets,
        )
        tz_.append(df)
        tz_.compact(zorder_by=["ts", "v"],
                    target_files_per_bucket=args.files_per_bucket)
        v_cut = int(args.rows * (1 - args.tail_frac))
        v_where = [("v", ">=", v_cut)]
        _, lin_v_skip = t.plan_files(where=v_where)
        zsc, z_v_skip = tz_.plan_files(where=v_where)
        assert z_v_skip, (
            "z-order pruning skipped 0 files — regression in Morton "
            "clustering or second-dimension stats"
        )
        z_pruned_s, zn1 = timed(lambda: tz_.read(where=v_where).count())
        z_full_s, zn2 = timed(
            lambda: tz_.read().filter(F.col("v") >= v_cut).count()
        )
        assert zn1 == zn2, (zn1, zn2)

        # bloom point-lookup leg: equality probe on a random-order
        # high-cardinality string column, bloom-sized table vs identical
        # no-bloom control. Built with FEW, LARGE files: at small
        # rows-per-file the column dictionary-encodes and parquet's
        # dictionary filter already covers point lookups (bloom is then
        # correctly skipped by the writer); the bloom tier exists for files
        # big enough that the dictionary overflows to plain encoding —
        # exactly the 100 TB row-group shape. Probing an ABSENT value is the
        # pure skip measurement (every row group bloom-rejects).
        bloom_rows = max(4 * args.rows, 8_000_000)
        bdf = (
            spark.range(bloom_rows)
            .select(
                F.format_string("k-%012d", F.col("id") % 64).alias("k"),
                F.col("id").alias("v"),
                F.format_string("u-%016x", F.xxhash64(F.col("id"))).alias("u"),
            )
        )
        rows_per_file = bloom_rows // 2
        tb = LakeTable.create(
            spark, os.path.join(tmp, "tb"), bdf.schema,
            bucket_by="k", bucket_count=2,
            properties={"write.bloom.columns": ["u"],
                        "write.bloom.ndv": rows_per_file},
        )
        tb.append(bdf)
        tb.compact(target_files_per_bucket=1)
        tc = LakeTable.create(
            spark, os.path.join(tmp, "tc"), bdf.schema,
            bucket_by="k", bucket_count=2,
        )
        tc.append(bdf)
        tc.compact(target_files_per_bucket=1)
        # absent-but-IN-RANGE probe: a mid-distribution hex value that
        # min/max page stats cannot exclude (a probe outside the hex
        # alphabet, e.g. "u-zzz…", is skipped by plain stats in BOTH tables
        # and shows nothing); collision odds vs 2^64-space hashes ≈ 0
        probe = "u-7777777777777777"
        bloom_s, nb = timed(
            lambda: tb.read().filter(F.col("u") == probe).count()
        )
        nobloom_s, nnb = timed(
            lambda: tc.read().filter(F.col("u") == probe).count()
        )
        assert nb == nnb == 0, (nb, nnb)

        print(json.dumps({
            "rows": args.rows,
            "tail_rows": n1,
            "files_total": len(scanned) + len(skipped),
            "files_scanned": len(scanned),
            "files_skipped": len(skipped),
            "pruned_sec": round(pruned_s, 3),
            "unpruned_sec": round(unpruned_s, 3),
            "speedup": round(unpruned_s / pruned_s, 2) if pruned_s > 0 else None,
            "bloom_lookup_sec": round(bloom_s, 3),
            "nobloom_lookup_sec": round(nobloom_s, 3),
            "bloom_speedup": round(nobloom_s / bloom_s, 2) if bloom_s > 0 else None,
            "zorder_v_files_skipped_linear": len(lin_v_skip),
            "zorder_v_files_skipped_zorder": len(z_v_skip),
            "zorder_v_files_total": len(zsc) + len(z_v_skip),
            "zorder_v_pruned_sec": round(z_pruned_s, 3),
            "zorder_v_full_sec": round(z_full_s, 3),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

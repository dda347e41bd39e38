"""Recall@k of the ANN tiers at SERVING parameters (r5 verdict item 4).

The correctness gate pins ANN results at settings chosen to be provably
exact (LSH radius = planes, IVF nprobe = cells); the number a user tuning
the recall/latency knobs actually needs is recall@k at radius < planes /
nprobe < C over MANY queries. This tool samples query vectors from the
(optionally 10×-expanded) embeddings table, computes the exact top-k once
with ``cosine_topk_batch``, then sweeps the knobs with the batched ANN
operators — every sweep cell is ONE Spark job, not Q driver round-trips —
and reports mean/min recall plus wall time per cell.

    # sf1 leg (10x-expanded embeddings; generate once with bench_sf1_neardup)
    python tools/bench_sf1_neardup.py --gen --data /tmp/sf1
    python tools/bench_ann_recall.py --emb /tmp/sf1/embeddings.parquet \
        --queries 50 --k 10
    # quick: sf0.1 directly
    python tools/bench_ann_recall.py \
        --emb /root/testdata/sf0.1/embeddings.parquet --queries 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdm_data_loader_utils_spark.operators.similarity import (  # noqa: E402
    ann_topk_lsh_batch,
    cosine_topk_batch,
    ivf_topk_batch,
    recall_at_k,
)
from cdm_data_loader_utils_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emb", required=True)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="bench-ann-recall",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(args.emb).persist()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    # deterministic spread-out sample: every (n // Q)-th vector by id
    stride = max(1, n // args.queries)
    qs = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id").limit(args.queries)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .persist()
    )
    nq = qs.count()

    t0 = time.perf_counter()
    exact = cosine_topk_batch(emb, qs, k=args.k).persist()
    exact.count()
    exact_sec = round(time.perf_counter() - t0, 2)

    def cell(label: str, approx_df) -> dict:
        t0 = time.perf_counter()
        r = recall_at_k(approx_df, exact, args.k)
        agg = r.agg(
            F.round(F.avg("recall"), 4).alias("mean"),
            F.round(F.min("recall"), 4).alias("min"),
            F.count("*").alias("q"),
        ).collect()[0]
        dt = round(time.perf_counter() - t0, 2)
        row = {"recall_mean": float(agg["mean"]), "recall_min": float(agg["min"]),
               "queries": int(agg["q"]), "sec": dt}
        print(f"# {label}: {row}", file=sys.stderr, flush=True)
        return row

    res = {
        "emb": args.emb, "vectors": n, "dim": dim, "queries": nq,
        "k": args.k, "exact_sec": exact_sec, "lsh": {}, "ivf": {},
    }
    for planes, mp in ((8, 0), (8, 1), (8, 2), (6, 1)):
        label = f"planes={planes},multiprobe={mp}"
        res["lsh"][label] = cell(
            f"lsh {label}",
            ann_topk_lsh_batch(emb, qs, dim, k=args.k,
                               num_planes=planes, multiprobe=mp),
        )
    for cells_n, nprobe in ((16, 1), (16, 2), (16, 4), (64, 8)):
        label = f"cells={cells_n},nprobe={nprobe}"
        res["ivf"][label] = cell(
            f"ivf {label}",
            ivf_topk_batch(emb, qs, k=args.k,
                           n_centroids=cells_n, nprobe=nprobe),
        )
    out = json.dumps(res)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()

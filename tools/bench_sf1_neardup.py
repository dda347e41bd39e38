"""sf1-scale bench leg for the near-dup/similarity family.

No sf1 parquet ships in the test data, so this tool synthesizes one
deterministically from sf0.1: each document/embedding is expanded into 10
variants (suffix-perturbed text / dyadic-perturbed vectors, float32-exact),
giving 50k docs and 20k embeddings — the 10x volume leg for the operators
whose r3 bench rows were single-session and noise-contaminated.

Usage (interleave by alternating --repo between two checkouts on the SAME
generated --data dir):

    python tools/bench_sf1_neardup.py --gen --data /tmp/sf1
    python tools/bench_sf1_neardup.py --repo /root/repo --data /tmp/sf1
    python tools/bench_sf1_neardup.py --repo /tmp/repo_r3 --data /tmp/sf1

Prints one JSON line {"label": ..., "times": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def get_session(repo: str, cpus: int):
    sys.path.insert(0, repo)
    from cdm_data_loader_utils_spark.session import get_spark

    spark = get_spark(
        app_name="bench-sf1-neardup", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def generate(spark, src: str, out: str) -> None:
    """10x each table, deterministically (no RNG state, no timestamps)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    k = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("k")
    docs10 = (
        docs.select("*", k)
        .select(
            (F.col("doc_id") * 10 + F.col("k")).alias("doc_id"),
            # k=0 keeps the original text (true near-dup pairs survive);
            # k>0 appends a deterministic variant marker so the expansion
            # creates CLUSTERS of near-dups, the realistic sf1 shape
            F.when(F.col("k") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", F.col("text"),
                                   F.concat(F.lit("variant"), F.col("k"))))
            .alias("text"),
            "lang", "source", "n_chars",
        )
    )
    docs10.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    emb10 = (
        emb.select("*", k)
        .select(
            (F.col("vec_id") * 10 + F.col("k")).alias("vec_id"),
            # perturb dim 0 by k/64 — float32-exact dyadic step, so the
            # expansion is bit-deterministic across engines and runs
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 0, x + F.col("k") / F.lit(64.0))
                .otherwise(x).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    emb10.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--data", default="/tmp/sf1_neardup")
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--label", default=None)
    ap.add_argument(
        "--family", default="neardup", choices=["neardup", "ann"],
        help="neardup = pair generators; ann = ANN top-k legs (r5)",
    )
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_session(args.repo, args.cpus)
    if args.gen:
        generate(spark, "/root/testdata/sf0.1", args.data)
        print(json.dumps({"generated": args.data}))
        return

    from cdm_data_loader_utils_spark.operators import dedup as D
    from cdm_data_loader_utils_spark.operators import similarity as S

    docs = spark.read.parquet(os.path.join(args.data, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(args.data, "embeddings.parquet"))
    if args.family == "ann":
        # same parameters as the sf0.1 gate queries (queries.py q_ann_lsh_topk
        # / q_ivf_ann_topk) over the 10× embedding table — the sf1 scale
        # evidence the r4 verdict flagged as missing for this family
        runs = {
            "cosine_topk_exact": lambda: S.cosine_topk(
                emb, [1.0] * 64, k=10
            ),
            "ann_lsh_topk": lambda: S.ann_topk_lsh(
                emb, [1.0] * 64, k=10, num_planes=4
            ),
            "ivf_ann_topk": lambda: S.ivf_topk(
                emb, [1.0] * 64, k=10, n_centroids=8, nprobe=2
            ),
        }
    else:
        runs = {
            "minhash_lsh_near_dups": lambda: D.minhash_lsh_pairs(
                docs, n=1, num_hashes=64, bands=16, threshold=0.6
            ),
            "simhash_near_dups": lambda: D.simhash_pairs(
                docs, max_hamming=3, bands=4
            ),
            "embedding_neardup_blocked": lambda: S.cosine_pairs_blocked(
                emb, threshold=0.4
            ),
        }
    try:
        from cdm_data_loader_utils_spark.operators.cache import release
    except ImportError:  # older checkouts in the interleave lack the helper
        def release(_df):
            return 0

    times, rows = {}, {}
    for name, fn in runs.items():
        t0 = time.perf_counter()
        df = fn()
        rows[name] = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
        release(df)
    print(json.dumps({
        "label": args.label or args.repo, "sf": 1.0,
        "docs": docs.count(), "embeddings": emb.count(),
        "times": times, "rows": rows,
    }))


if __name__ == "__main__":
    main()

"""Phase-level timing probe for minhash_lsh_pairs (guide §1: measure first).

Times each pipeline stage in isolation with a noop-style count so the round's
optimization targets the actual wall, not a guess. Run standalone:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/minhash_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cdm_data_loader_utils_spark import queries as Q  # noqa: E402
from cdm_data_loader_utils_spark.operators import dedup as D  # noqa: E402
from cdm_data_loader_utils_spark.session import get_spark  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{label:28s} {dt:7.2f}s  rows={n}")
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="minhash-probe", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    d = Q.load(spark, sf_dir, "documents")
    d.count()  # warm the scan

    num_hashes, bands, threshold = 64, 16, 0.6
    max_bucket_size, est_fraction = 500, 0.75
    rows = num_hashes // bands

    spark.sparkContext.setJobDescription("minhash: shingles")
    sh = d.select(F.col("doc_id").alias("id"),
                  D.word_shingles("text", 1).alias("sh"))
    t("shingles", sh)

    spark.sparkContext.setJobDescription("minhash: signatures")
    sigs = D.minhash_signatures(d, "text", "doc_id", 1, num_hashes).persist()
    t("signatures", sigs)

    spark.sparkContext.setJobDescription("minhash: banding+buckets")
    banded = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)]
                           ).alias("bucket"),
            ) for b in range(bands)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bucket").persist()
    t("banded", banded)

    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("__bs"))
    kept = (banded.join(sizes, ["band", "bucket"])
            .filter(F.col("__bs") <= max_bucket_size).drop("__bs"))
    a, b = kept.alias("a"), kept.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    ).persist()
    spark.sparkContext.setJobDescription("minhash: candidates")
    t("candidates", cand)

    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        lambda v: v == 1,
    )) / F.lit(num_hashes)
    cand2 = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .filter(est >= F.lit(est_fraction * threshold))
        .select("id_a", "id_b")
    ).persist()
    spark.sparkContext.setJobDescription("minhash: estimate prefilter")
    t("est-filtered", cand2)

    shp = d.select(F.col("doc_id").alias("id"),
                   D.word_shingles("text", 1).alias("sh")).persist()
    va = shp.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    vb = shp.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand2.join(va, "id_a").join(vb, "id_b")
        .withColumn("jaccard", F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    spark.sparkContext.setJobDescription("minhash: exact verify")
    t("verified", verified)

    spark.sparkContext.setJobDescription("minhash: full operator e2e")
    t0 = time.perf_counter()
    full = D.minhash_lsh_pairs(d, n=1, num_hashes=num_hashes, bands=bands,
                               threshold=threshold)
    n = full.count()
    print(f"{'e2e (operator)':28s} {time.perf_counter() - t0:7.2f}s  rows={n}")


if __name__ == "__main__":
    main()

"""Compare minhash-signature implementations for speed AND bit-equality.

v0: current — 64 interpreted HOF passes (array_min(transform(...)))
v1: explode tokens + one hash aggregate with 64 codegen'd min() columns
v2: Arrow pandas UDF, numpy affine + segment-min

All three must produce IDENTICAL signatures (exact int64 arithmetic).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from cdm_data_loader_utils_spark import queries as Q  # noqa: E402
from cdm_data_loader_utils_spark.operators import dedup as D  # noqa: E402
from cdm_data_loader_utils_spark.session import get_spark  # noqa: E402

NUM = 64
P = D.MINHASH_PRIME
PARAMS = D.affine_params(NUM)


def v0(d):
    return D.minhash_signatures(d, "text", "doc_id", 1, NUM)


def v1(d):
    sh = d.select(F.col("doc_id").alias("id"),
                  D.word_shingles("text", 1).alias("sh"))
    ex = sh.select(
        "id", F.explode_outer(
            F.transform("sh", lambda s: D.portable_hash32(s))).alias("x"))
    aggs = [
        F.min(F.pmod(F.lit(a).cast("long") * F.col("x") + F.lit(b).cast("long"),
                     F.lit(P).cast("long"))).alias(f"h{i}")
        for i, (a, b) in enumerate(PARAMS)
    ]
    g = ex.groupBy("id").agg(*aggs)
    return g.select("id", F.array(*[F.col(f"h{i}") for i in range(NUM)]).alias("sig"))


def v2(d):
    A = np.array([a for a, _ in PARAMS], dtype=np.int64)
    B = np.array([b for _, b in PARAMS], dtype=np.int64)

    def _impl(xs_series):
        n = len(xs_series)
        vals = xs_series.to_numpy()
        lens = np.fromiter(
            (0 if v is None else len(v) for v in vals),
            dtype=np.int64, count=n)
        out = np.empty(n, dtype=object)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in vals[nz]])
            m = (flat[:, None] * A[None, :] + B[None, :]) % P
            starts = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            mins = np.minimum.reduceat(m, starts, axis=0)
            j = 0
            for i in range(n):
                if nz[i]:
                    out[i] = mins[j]
                    j += 1
        return pd.Series(out)

    sig_udf = F.pandas_udf(_impl, T.ArrayType(T.LongType()))
    sh = d.select(F.col("doc_id").alias("id"),
                  D.word_shingles("text", 1).alias("sh"))
    xs = F.transform("sh", lambda s: D.portable_hash32(s))
    return sh.select("id", sig_udf(xs).alias("sig"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="sig-variants", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    d = Q.load(spark, sf_dir, "documents")
    d.count()

    frames = {}
    for name, fn in [("v0", v0), ("v1", v1), ("v2", v2)]:
        df = fn(d)
        for trial in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"{name} trial{trial}: {time.perf_counter() - t0:6.2f}s")
        frames[name] = df

    base = {r["id"]: list(r["sig"]) for r in frames["v0"].collect()}
    for name in ("v1", "v2"):
        got = {r["id"]: list(r["sig"]) for r in frames[name].collect()}
        assert set(got) == set(base), f"{name}: id set differs"
        bad = [k for k in base if got[k] != base[k]]
        print(f"{name}: {'IDENTICAL' if not bad else f'{len(bad)} MISMATCHES'}")
        if bad:
            k = bad[0]
            print("  e.g.", k, base[k][:4], got[k][:4])


if __name__ == "__main__":
    main()

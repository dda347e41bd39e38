"""Similarity search over embedding columns (``array<float>``).

No reference counterpart (cdm-data-loader-utils has no vector ops); required
as first-class training-data-pipeline capability. Two tiers:

* brute-force cosine — exact, one pass, JVM-side ``aggregate``/``zip_with``
  arithmetic (no Python);
* random-hyperplane LSH — the scale path: hash every vector to a small
  bucket code, search only within the probe's bucket (and optionally its
  neighbors). Hyperplanes are derived deterministically from seeded hashes,
  so results are reproducible at any parallelism.

At 100 TB the brute-force path is a full scan per query (fine for batched
offline scoring with thousands of queries fused into one crossJoin stage);
the LSH path turns it into a bucket-pruned join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    """JVM-side dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    Deterministic ordering (score desc, id asc); Catalyst turns
    orderBy+limit into TakeOrderedAndProject — no full sort at scale."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Brute-force self-join — exact baseline; use :func:`lsh_bucket` blocking
    for corpora."""
    # precompute norms once per vector (2·N array passes) instead of per
    # pair (2·N² passes); only the dot product remains pairwise
    withn = df.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__n")
    )
    a = withn.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("__n").alias("na")
    )
    b = withn.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("__n").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_size: int = 1024,
    num_blocks: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via blocked matrix multiply — the scale path.

    The exact :func:`cosine_pairs` self-join materializes N²/2 rows with two
    full vectors each; at corpus scale that shuffle is the wall. Here vectors
    are grouped into B hash blocks (one aggregate), the B×(B+1)/2 block
    pairs cross-join as *block super-rows* (tiny: B² rows of packed arrays),
    and an Arrow-batched ``mapInPandas`` computes each block-pair's cosine
    submatrix with one numpy matmul — O(N²·d) flops but O((N/B)²·d) memory
    per task and only O(N·B) bytes shuffled.

    Scores are float64 matmul results rounded to 6dp; summation order may
    differ from the sequential exact path in the last ulp, so this variant
    is registered rows-only in the correctness gate and equivalence to
    :func:`cosine_pairs` is asserted in tests."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if num_blocks is None:
        n = df.count()
        num_blocks = max(1, (n + block_size - 1) // block_size)
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).cast("int")
    packed = df.groupBy(blk.alias("blk")).agg(
        F.collect_list(F.col(id_col)).alias("ids"),
        F.collect_list(F.col(vec_col)).alias("vecs"),
    )
    a = packed.select(
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a")
    )
    b = packed.select(
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b")
    )
    block_pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def _matmul(batches):
        for pdf in batches:
            ids_a_out, ids_b_out, cos_out = [], [], []
            for _, row in pdf.iterrows():
                ia = np.asarray(row["ids_a"], dtype=np.int64)
                ib = np.asarray(row["ids_b"], dtype=np.int64)
                va = np.asarray([np.asarray(v, dtype=np.float64) for v in row["vecs_a"]])
                vb = np.asarray([np.asarray(v, dtype=np.float64) for v in row["vecs_b"]])
                na = np.linalg.norm(va, axis=1)
                nb = np.linalg.norm(vb, axis=1)
                sims = (va @ vb.T) / np.outer(na, nb)
                ii, jj = np.where(sims >= threshold)
                same = row["blk_a"] == row["blk_b"]
                for i, j in zip(ii, jj):
                    x, y = int(ia[i]), int(ib[j])
                    if same and x >= y:
                        continue
                    if x > y:
                        x, y = y, x
                    ids_a_out.append(x)
                    ids_b_out.append(y)
                    cos_out.append(round(float(sims[i, j]), 6))
            yield pd.DataFrame({"id_a": ids_a_out, "id_b": ids_b_out, "cosine": cos_out})

    return block_pairs.mapInPandas(_matmul, out_schema)


def _hyperplane(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: component j is a
    hash-derived value in [-1, 1). Pure Python at plan time (tiny: dim×planes
    floats baked into the plan as literals)."""
    out = []
    for j in range(dim):
        h = (hash((seed, plane, j)) & 0xFFFFFFFF) / 0xFFFFFFFF
        out.append(2.0 * h - 1.0)
    return out


def lsh_bucket(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH: adds a ``bucket`` int column (one bit
    per hyperplane). Cosine-similar vectors collide with probability
    (1 − θ/π)^planes."""
    bucket = F.lit(0)
    for p in range(num_planes):
        plane = _hyperplane(dim, p, seed)
        pc = F.array(*[F.lit(x) for x in plane])
        bit = (dot(F.col(vec_col), pc) > 0).cast("int")
        bucket = bucket * 2 + bit
    return df.withColumn("bucket", bucket)


def ann_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    num_planes: int = 6,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    Recall/latency knob is ``num_planes`` (fewer planes → bigger buckets).
    The bucket filter is a pushed-down int comparison over a precomputable
    column — at scale, persist ``lsh_bucket`` output partitioned by bucket
    and this becomes a partition-pruned scan."""
    dim = len(query)
    bucketed = lsh_bucket(df, dim, num_planes, seed, vec_col)
    qb = 0
    for p in range(num_planes):
        plane = _hyperplane(dim, p, seed)
        s = sum(q * w for q, w in zip(query, plane))
        qb = qb * 2 + (1 if s > 0 else 0)
    qc = F.array(*[F.lit(float(x)) for x in query])
    return (
        bucketed.filter(F.col("bucket") == qb)
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), qc), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (argmax cosine). Centroids are plan-time literals (an offline k-means or
    hash-seeded sample); at scale write the output partitioned by
    ``centroid_id`` so probes scan only nprobe partitions."""
    best_id, best_score = F.lit(-1), F.lit(-2.0)
    for i, c in enumerate(centroids):
        cc = F.array(*[F.lit(float(x)) for x in c])
        s = cosine(F.col(vec_col), cc)
        better = s > best_score
        best_id = F.when(better, F.lit(i)).otherwise(best_id)
        best_score = F.when(better, s).otherwise(best_score)
    return df.withColumn("centroid_id", best_id)

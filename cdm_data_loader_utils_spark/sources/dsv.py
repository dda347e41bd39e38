"""Delimiter-separated reads with corrupt-record capture (S1/S2/S3/S4).

Re-expresses the reference reader module
(``/root/reference/src/cdm_data_loader_utils/readers/dsv.py:16-131``):
PERMISSIVE-only CSV/TSV with an explicit schema, malformed rows captured into
a corrupt-record column instead of dropped, optional eager materialization to
surface reader errors at call site (``readers/dsv.py:79-80`` ``df.head(1)``).

Schema-first: inference is opt-in only (reference uses it in exactly two
low-rigor paths, ``parsers/gene_association_file.py:108``,
``core/refseq_io.py:129-133``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CORRUPT_RECORD_COL


def read_dsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = ",",
    header: bool = False,
    eager_check: bool = False,
    comment: str | None = None,
    **options,
) -> DataFrame:
    """PERMISSIVE read with corrupt-record column appended to the schema.

    Returns all declared columns plus ``__invalid_data__`` (null for clean
    rows, raw line for malformed ones) — the caller splits with
    :func:`split_corrupt`."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_RECORD_COL, T.StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_RECORD_COL)
        .option("delimiter", delimiter)
        .option("header", str(header).lower())
        .option("enforceSchema", "true")
    )
    if comment:
        reader = reader.option("comment", comment)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if eager_check:
        df.head(1)  # surface reader/DDL errors here, not at the first action
    return df


def read_tsv(spark: SparkSession, path: str, schema: T.StructType, **kw) -> DataFrame:
    """TSV preset (``readers/dsv.py:90-110``)."""
    return read_dsv(spark, path, schema, delimiter="\t", **kw)


def read_csv_inferred(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """Headered CSV with inference — the GAF-style low-rigor path
    (``parsers/gene_association_file.py:106-119``)."""
    return spark.read.csv(path, header=header, inferSchema=True)


def read_tsv_renamed(
    spark: SparkSession,
    path: str,
    names: list[str],
    comment: str = "#",
) -> DataFrame:
    """Comment-skipping TSV with positional column names — the assembly-index
    pattern (``core/refseq_io.py:122-175``: 38-column ``toDF(*names)``)."""
    df = spark.read.option("comment", comment).option("delimiter", "\t").csv(path)
    return df.toDF(*names)


def export_single_csv(df: DataFrame, target: str, header: bool = True) -> str:
    """K6: export a (small) result as ONE csv file at an exact path.

    Reference analogue ``cli/detect_updates.py:99-102`` collects to pandas
    on the driver; here the write stays distributed (``coalesce(1)`` — one
    writer task, no driver materialization) and the part file is renamed
    into place. For results that are large, don't coalesce — keep the
    directory-of-parts layout."""
    import glob
    import os
    import shutil

    tmp = target + ".__tmp__"
    (
        df.coalesce(1)
        .write.option("header", str(header).lower())
        .mode("overwrite")
        .csv(tmp)
    )
    parts = glob.glob(os.path.join(tmp, "part-*.csv"))
    if not parts:
        raise FileNotFoundError(
            f"no local part file under {tmp}: export_single_csv requires a "
            "driver-local target (Spark wrote to the cluster default FS); "
            "export to a distributed path with df.write.csv directly"
        )
    os.replace(parts[0], target)
    shutil.rmtree(tmp, ignore_errors=True)
    return target


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) split on the corrupt-record column.

    The input is cached first — Spark's documented requirement for
    referencing the corrupt-record column: without it, column pruning
    reduces a ``corrupt.count()`` (the primary audit use) to a scan of ONLY
    the corrupt column and the query fails with
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_RECORD_COL).isNull()).drop(CORRUPT_RECORD_COL)
    corrupt = df.filter(F.col(CORRUPT_RECORD_COL).isNotNull())
    return clean, corrupt

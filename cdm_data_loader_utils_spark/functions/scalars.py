"""Scalar function library — every driver-side Python helper in the
reference, re-expressed as vectorized column expressions or Arrow-batched
pandas UDFs (the reference registers zero Spark UDFs and runs all of this on
the driver, its main scalability defect — SURVEY §2.9).

Each function documents its reference counterpart (file:line).
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# --- fingerprints ----------------------------------------------------------
def sha256_fingerprint(*cols: Column | str) -> Column:
    """Distributed SHA-256 content hash; replaces the driver-side
    ``text_sha256`` (``/root/reference/src/cdm_data_loader_utils/parsers/
    refseq_pipeline/core/refseq_io.py:216-221``) and ``calculate_hash``
    (``utils/calculate_hash.py:69-87``). Normalizes newlines like
    ``normalize_multiline_text`` (``refseq_io.py:71-75``)."""
    # concat_ws silently SKIPS null columns, which would hash ('x', NULL,
    # 'b') and ('x', 'b', NULL) identically — encode nulls with a marker the
    # value space cannot produce, so distinct records never collide
    parts = [
        F.coalesce(
            F.concat(F.lit("v:"), (F.col(c) if isinstance(c, str) else c).cast("string")),
            F.lit("null:"),
        )
        for c in cols
    ]
    joined = F.concat_ws("\x1f", *parts)
    normalized = F.regexp_replace(joined, "\r\n?", "\n")
    return F.sha2(normalized, 256)


@pandas_udf(T.StringType())
def uuid5_udf(ns: pd.Series, name: pd.Series) -> pd.Series:
    """Deterministic UUIDv5 id generation, vectorized per Arrow batch.

    Reference: driver-side ``uuid.uuid5(NAMESPACE, key)`` per record
    (``parsers/refseq_pipeline/core/cdm_parse.py:57-66``,
    ``refseq_importer/core/cdm_builders.py:51-56``)."""
    return pd.Series(
        [
            str(uuid.uuid5(uuid.UUID(n), k)) if (n is not None and k is not None) else None
            for n, k in zip(ns, name)
        ]
    )


def deterministic_id(*cols: Column | str, namespace: str = "6ba7b810-9dad-11d1-80b4-00c04fd430c8") -> Column:
    """uuid5 over a composite key — pandas UDF wrapper of the reference's id
    builder; prefer :func:`sha256_fingerprint` when a raw hash suffices."""
    # null-marking as in sha256_fingerprint: concat_ws alone would give
    # distinct records with shifted nulls the SAME uuid
    parts = [
        F.coalesce(
            F.concat(F.lit("v:"), (F.col(c) if isinstance(c, str) else c).cast("string")),
            F.lit("null:"),
        )
        for c in cols
    ]
    key = F.concat_ws("|", *parts)
    return uuid5_udf(F.lit(namespace), key)


# --- safe numeric coercion ---------------------------------------------------
def safe_int(col: Column | str) -> Column:
    """Comma-tolerant integer coercion → null on garbage; vectorized form of
    driver-side ``safe_int`` (``core/cdm_parse.py:15-20``)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_cast, not cast: under Spark 4's default ANSI mode a plain cast
    # THROWS on garbage — one malformed value would abort the whole job
    # instead of yielding the contracted null
    return F.regexp_replace(c.cast("string"), ",", "").try_cast("long")

def safe_float(col: Column | str) -> Column:
    """``safe_float`` (``core/cdm_parse.py:22-26``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c.cast("string"), ",", "").try_cast("double")

def percent_to_fraction(col: Column | str) -> Column:
    """``percent_to_fraction`` (``core/cdm_parse.py:28-31``): '42%' → 0.42."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.regexp_replace(c.cast("string"), "[%,]", "").try_cast("double") / 100.0
    )


# --- nested extraction -------------------------------------------------------
def json_get_first(col: Column | str, *paths: str) -> Column:
    """First non-null among several JSON paths — vectorized replacement for
    the driver-side ``get_first``/``pick_section`` dict walkers
    (``core/cdm_parse.py:37-51``, ``refseq_importer/core/extractors.py:13-81``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.get_json_object(c, p) for p in paths])


def row_to_json(*cols: str) -> Column:
    """Serialize selected columns to one JSON string (rejects raw capture,
    ``audit/rejects.py:73``)."""
    return F.to_json(F.struct(*cols))


# --- conditional / fallback --------------------------------------------------
def coalesce_fallback(primary: Column | str, fallback: Column | str) -> Column:
    """Null fallback (reference spells it when(isNull).otherwise —
    ``parsers/gene_association_file.py:190-193``)."""
    p = F.col(primary) if isinstance(primary, str) else primary
    fb = F.col(fallback) if isinstance(fallback, str) else fallback
    return F.coalesce(p, fb)


def guarded_date(col: Column | str, fmt: str = "yyyyMMdd") -> Column:
    """rlike-guarded date parse (``parsers/gene_association_file.py:122-127``)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_to_date: the rlike guard cannot catch range garbage ('99999999'
    # matches ^[0-9]{8}$ but has no month 99), which THROWS under ANSI
    pattern = "^[0-9]{8}$" if fmt == "yyyyMMdd" else ".*"
    return F.when(c.rlike(pattern), F.try_to_date(c, fmt)).otherwise(F.lit(None))

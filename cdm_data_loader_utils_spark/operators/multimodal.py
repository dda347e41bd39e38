"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode libraries (PIL/ffmpeg/torchaudio) are NOT
in this container, so the codec boundary is stubbed behind
``DecoderNotAvailable`` with a deterministic fake used in tests — the Spark
side (schema, batching, partition sizing, UDF signatures) is real.

Scale notes: binary payloads dominate partition size — repartition by
``ceil(total_bytes / target_partition_bytes)`` before mapInPandas so a batch
of decoded frames fits executor memory; metadata-only passes (filtering by
width/duration) never touch the payload column thanks to parquet column
pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


class DecoderNotAvailable(NotImplementedError):
    """Raised when a real codec is required but not installed."""


def _decode_image_real(payload: bytes) -> list[float]:  # pragma: no cover
    raise DecoderNotAvailable(
        "image decode requires PIL/opencv, not present in this environment; "
        "install and replace _decode via set_decoder()"
    )


def _decode_fake(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in: bytes → fixed-dim float histogram. Keeps the
    whole pipeline testable without codec libraries."""
    if payload is None:
        return [0.0] * dim
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = max(1, len(payload))
    return [b / total for b in buckets]


_DECODER = _decode_fake


def set_decoder(fn) -> None:
    """Swap in a real decoder (payload: bytes) -> list[float]."""
    global _DECODER
    _DECODER = fn


def extract_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    Batch shape: the iterator yields pandas DataFrames of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows; decode failures
    surface as decode_ok=False rather than task failure (PERMISSIVE-style,
    cf. the reference corrupt-record discipline, readers/dsv.py:16-29)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_DECODER(payload, feature_dim)
                                 if _DECODER is _decode_fake else _DECODER(payload))
                    oks.append(True)
                except DecoderNotAvailable:
                    raise
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def size_partitions_for_payloads(
    df: DataFrame, total_bytes: int, target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition so each task's payload bytes fit the target (binary rows
    are huge; default row-count-based splits overload executors)."""
    n = max(1, (total_bytes + target_partition_bytes - 1) // target_partition_bytes)
    return df.repartition(int(n))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-only frame-sampling plan: for each video, the list of
    timestamps to decode — computed without touching payloads (column
    pruning keeps the scan payload-free), then joined back for targeted
    decode."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.sequence(
            F.lit(0),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
            F.lit(every_ms),
        ).alias("sample_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes).

    kind/payload derive from sha256 so the correctness-gate oracle can
    regenerate the identical table in plain SQL (payload = ascii bytes of
    the hex digest; kind = first hex byte mod 3)."""
    kind_hex = F.sha2(F.concat_ws("|", F.lit(seed), F.col("id"), F.lit("kind")), 256)
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (
                F.pmod(F.conv(F.substring(kind_hex, 1, 2), 16, 10).cast("int"), F.lit(3))
                + 1
            ).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat_ws("|", F.lit(seed), F.col("id")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), 1024) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 2)), 1024) + 1).cast("int").alias("height"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 3)), 60000) + 1).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    return df

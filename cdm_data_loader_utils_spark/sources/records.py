"""Record-oriented sources: delimited-record files and paginated REST tails.

Parity with the reference's driver-side record readers, distributed:

* FASTA reader — driver loop over lines building ``Feature`` objects
  (``/root/reference/src/cdm_data_loader_utils/parsers/fasta.py:10-44``);
* streaming XML iterparse — driver generator
  (``utils/xml_utils.py:129-152``);
* paginated REST fetch with retry/backoff — driver generator
  (``parsers/refseq_pipeline/core/datasets_api.py:9-94``,
  ``core/refseq_io.py:38-55``).

Here record *segmentation* runs on executors: files load as whole values
(``binaryFile`` source — one task per file, gzip-aware), and an Arrow-batched
``mapInPandas`` splits each file into records. Per-file parallelism matches
the reference's unit of work; at corpus scale you get one task per file with
no driver involvement. The REST tail necessarily stays a driver loop (it is
I/O against a remote cursor — same shape as the reference), but each page
lands as a DataFrame immediately, so Spark work overlaps the fetch loop.
"""

from __future__ import annotations

import gzip
import io
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("header", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def read_delimited_records(
    spark: SparkSession,
    path_glob: str,
    record_prefix: str = ">",
) -> DataFrame:
    """FASTA-style '>'-delimited records, segmented executor-side.

    Each record = a header line starting with ``record_prefix`` plus the
    body lines until the next header. Gzip is handled transparently
    (reference gz-awareness: ``utils/xml_utils.py:134-140``)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"path": [], "record_idx": [], "header": [], "body": []}
            for path, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if path.endswith(".gz"):
                    data = gzip.decompress(data)
                text = data.decode("utf-8", errors="replace")
                header, body, idx = None, [], 0
                for line in io.StringIO(text):
                    line = line.rstrip("\n")
                    if line.startswith(record_prefix):
                        if header is not None:
                            rows["path"].append(path)
                            rows["record_idx"].append(idx)
                            rows["header"].append(header)
                            rows["body"].append("\n".join(body))
                            idx += 1
                        header, body = line[len(record_prefix):], []
                    elif header is not None:
                        body.append(line)
                if header is not None:
                    rows["path"].append(path)
                    rows["record_idx"].append(idx)
                    rows["header"].append(header)
                    rows["body"].append("\n".join(body))
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(_segment, RECORD_SCHEMA)


def tail_paginated(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    schema: T.StructType,
    max_retries: int = 3,
    backoff_s: float = 0.5,
    max_pages: int | None = None,
) -> DataFrame:
    """Paginated cursor tail → one DataFrame (union of page frames).

    ``fetch_page(token) -> (rows, next_token)``; retries with exponential
    backoff mirror the reference's HTTP session policy (3 retries, backoff
    0.5 — ``core/refseq_io.py:48-52``). The fetch loop is driver-side by
    nature; rows become executor data at each ``createDataFrame``."""
    frames: list[DataFrame] = []
    token: str | None = None
    pages = 0
    while True:
        attempt = 0
        while True:
            try:
                rows, token = fetch_page(token)
                break
            except Exception:
                attempt += 1
                if attempt > max_retries:
                    raise
                time.sleep(backoff_s * (2 ** (attempt - 1)))
        if rows:
            frames.append(
                spark.createDataFrame(
                    [tuple(r.get(f.name) for f in schema.fields) for r in rows],
                    schema,
                )
            )
        pages += 1
        if token is None or (max_pages is not None and pages >= max_pages):
            break
    if not frames:
        return spark.createDataFrame([], schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out

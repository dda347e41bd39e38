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
        T.StructField("error", T.StringType()),
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
    (reference gz-awareness: ``utils/xml_utils.py:134-140``). CRLF files
    strip the carriage return too (an HTTP-downloaded corpus must hash and
    join identically to its LF-saved twin). PERMISSIVE: a corrupt/truncated
    file (bad gzip, etc.) yields ONE row with ``error`` set instead of
    failing the task."""
    files = spark.read.format("binaryFile").load(path_glob)

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"path": [], "record_idx": [], "header": [],
                    "body": [], "error": []}

            def emit(path, idx, header, body, err=None):
                rows["path"].append(path)
                rows["record_idx"].append(idx)
                rows["header"].append(header)
                rows["body"].append(body)
                rows["error"].append(err)

            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    data = bytes(blob)
                    if path.endswith(".gz"):
                        data = gzip.decompress(data)
                    text = data.decode("utf-8", errors="replace")
                except Exception as e:
                    emit(path, 0, None, None, str(e))
                    continue
                header, body, idx = None, [], 0
                for line in io.StringIO(text):
                    line = line.rstrip("\r\n")
                    if line.startswith(record_prefix):
                        if header is not None:
                            emit(path, idx, header, "\n".join(body))
                            idx += 1
                        header, body = line[len(record_prefix):], []
                    elif header is not None:
                        body.append(line)
                if header is not None:
                    emit(path, idx, header, "\n".join(body))
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(_segment, RECORD_SCHEMA)


XML_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("tag", T.StringType()),
        T.StructField("xml", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def read_xml_records(
    spark: SparkSession,
    path_glob: str,
    tag: str,
    namespace: str | None = None,
) -> DataFrame:
    """Tag-based streaming XML segmentation, executor-side.

    Distributed re-expression of the reference's driver generator
    ``stream_xml_file`` (``utils/xml_utils.py:129-152``: lxml iterparse on a
    namespaced tag, gz-aware, ``elem.clear()`` as it goes) — the ingest shape
    behind the UniProt/metalink parsers (``parsers/uniprot/uniprot_kb.py:
    365-433``). Files load whole via ``binaryFile`` (one task per file);
    an Arrow-batched ``mapInPandas`` iterparses each, emitting one row per
    matching subtree as serialized XML, detaching every finished element from
    its parent (parent-stack tracked, so arbitrarily nested record tags and
    never-matching files stay bounded) — memory is O(record), not O(file).

    ``namespace=None`` matches on local tag name; otherwise the exact
    ``{namespace}tag``. Malformed XML does not fail the task: records parsed
    before the error are kept, plus one row with ``error`` set (the
    PERMISSIVE corrupt-record discipline, cf. reference invalid-XML fixtures
    ``tests/data/uniprot/metalink/invalid/``)."""
    files = spark.read.format("binaryFile").load(path_glob)
    want = f"{{{namespace}}}{tag}" if namespace else tag

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = {"path": [], "record_idx": [], "tag": [], "xml": [], "error": []}

            def emit(path, idx, tg, xml, err):
                rows["path"].append(path)
                rows["record_idx"].append(idx)
                rows["tag"].append(tg)
                rows["xml"].append(xml)
                rows["error"].append(err)

            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    data = bytes(blob)
                    if path.endswith(".gz"):
                        data = gzip.decompress(data)
                except Exception as e:
                    # a truncated .gz must produce an error ROW, not a task
                    # failure — same PERMISSIVE contract as malformed XML
                    emit(path, 0, None, None, str(e))
                    continue
                idx = 0
                # Parent stack so finished elements can be detached from
                # their OWN parent (root.clear() only drops the root's
                # direct children — a record tag nested two+ levels down
                # would accumulate in its intermediate container, and a
                # never-matching file would accumulate everything, making
                # memory O(file) instead of O(record)).
                stack: list = []
                want_depth = 0  # how many open ancestors match the tag
                try:
                    for event, elem in ET.iterparse(
                        io.BytesIO(data), events=("start", "end")
                    ):
                        name = elem.tag if namespace else elem.tag.split("}")[-1]
                        if event == "start":
                            stack.append(elem)
                            if name == want:
                                want_depth += 1
                            continue
                        stack.pop()
                        if name == want:
                            want_depth -= 1
                            emit(
                                path, idx, elem.tag,
                                ET.tostring(elem, encoding="unicode"), None,
                            )
                            idx += 1
                        # A finished element outside any open record subtree
                        # is never serialized again: clear it and detach it
                        # from its parent (it is always the parent's LAST
                        # child at its end event, so removal is O(1)).
                        if want_depth == 0 and stack:
                            parent = stack[-1]
                            elem.clear()
                            if len(parent) and parent[-1] is elem:
                                del parent[-1]
                except ET.ParseError as e:
                    emit(path, idx, None, None, str(e))
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(_segment, XML_RECORD_SCHEMA)


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
    nature (a remote cursor); rows accumulate as plain tuples and become ONE
    DataFrame at the end — a per-page union chain would build an
    O(pages)-deep plan whose analysis cost grows quadratically on long
    tails, for zero gain (createDataFrame is lazy, nothing overlaps the
    fetch either way)."""
    all_rows: list[tuple] = []
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
        all_rows.extend(
            tuple(r.get(f.name) for f in schema.fields) for r in rows
        )
        pages += 1
        if token is None or (max_pages is not None and pages >= max_pages):
            break
    return spark.createDataFrame(all_rows, schema)

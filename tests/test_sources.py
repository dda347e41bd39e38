"""Source tests: delimited-record segmentation and paginated tail."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import types as T

from cdm_data_loader_utils_spark.sources.records import (
    read_delimited_records,
    tail_paginated,
)

FASTA = """>seq1 first
ACGT
TTAA
>seq2 second
GGGG
>seq3 third
"""


def test_delimited_record_segmentation(spark, tmp_path):
    p1 = os.path.join(tmp_path, "a.fa")
    with open(p1, "w") as f:
        f.write(FASTA)
    p2 = os.path.join(tmp_path, "b.fa.gz")
    with gzip.open(p2, "wt") as f:
        f.write(">gz1 zipped\nCCCC\n")
    out = read_delimited_records(spark, os.path.join(tmp_path, "*"))
    rows = {r.header: r.body for r in out.collect()}
    assert rows["seq1 first"] == "ACGT\nTTAA"
    assert rows["seq2 second"] == "GGGG"
    assert rows["seq3 third"] == ""
    assert rows["gz1 zipped"] == "CCCC"
    # per-file record indexes restart at 0
    idx = {(r.header, r.record_idx) for r in out.collect()}
    assert ("seq1 first", 0) in idx and ("gz1 zipped", 0) in idx


def test_tail_paginated_with_retries(spark):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    calls = {"n": 0, "fails": 0}

    def fetch(token):
        calls["n"] += 1
        # fail once on the second page to exercise retry
        if token == "p2" and calls["fails"] == 0:
            calls["fails"] += 1
            raise ConnectionError("flaky")
        if token is None:
            return [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}], "p2"
        if token == "p2":
            return [{"id": 3, "v": "c"}], None
        raise AssertionError(token)

    out = tail_paginated(spark, fetch, schema, backoff_s=0.01)
    assert sorted((r.id, r.v) for r in out.collect()) == [(1, "a"), (2, "b"), (3, "c")]
    assert calls["fails"] == 1

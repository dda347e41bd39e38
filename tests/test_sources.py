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


def test_xml_tag_segmentation(spark, tmp_path):
    """Tag-based XML records: namespaced entries, gz transparency, and
    malformed XML captured as an error row instead of a task failure."""
    import gzip as _gzip

    from cdm_data_loader_utils_spark.sources.records import read_xml_records

    ns = "http://example.org/up"
    doc = (
        f'<u:uniprot xmlns:u="{ns}">'
        f'<u:entry id="A"><u:name>alpha</u:name></u:entry>'
        f'<u:entry id="B"><u:name>beta</u:name></u:entry>'
        f"<u:other>skip</u:other>"
        f'<u:entry id="C"><u:name>gamma</u:name></u:entry>'
        f"</u:uniprot>"
    )
    (tmp_path / "a.xml").write_text(doc)
    (tmp_path / "b.xml.gz").write_bytes(_gzip.compress(doc.encode()))
    (tmp_path / "bad.xml").write_text("<u:uniprot><u:entry>no close")

    out = read_xml_records(
        spark, str(tmp_path) + "/*.xml*", tag="entry", namespace=ns
    ).collect()
    ok = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert len(ok) == 6  # 3 entries × (plain + gz)
    assert all(r.tag == f"{{{ns}}}entry" for r in ok)
    assert sorted(r.record_idx for r in ok if r.path.endswith("a.xml")) == [0, 1, 2]
    assert 'id="B"' in [r.xml for r in ok if r.record_idx == 1][0]
    assert len(bad) == 1 and bad[0].path.endswith("bad.xml")

    # local-name matching without a namespace
    out2 = read_xml_records(spark, str(tmp_path) + "/a.xml", tag="entry").collect()
    assert len(out2) == 3


def test_xml_nested_record_tag_two_levels_deep(spark, tmp_path):
    """Record tags nested below intermediate containers parse correctly —
    the memory-bound path detaches finished records from their OWN parent
    (root.clear() alone would let a container accumulate every record)."""
    from cdm_data_loader_utils_spark.sources.records import read_xml_records

    doc = (
        "<root><meta><info>x</info></meta><batch><group>"
        + "".join(f'<rec id="{i}"><val>{i * i}</val></rec>' for i in range(50))
        + "</group></batch></root>"
    )
    (tmp_path / "nested.xml").write_text(doc)
    out = read_xml_records(spark, str(tmp_path / "nested.xml"), tag="rec").collect()
    ok = [r for r in out if r.error is None]
    assert len(ok) == 50
    assert sorted(r.record_idx for r in ok) == list(range(50))
    by_idx = {r.record_idx: r.xml for r in ok}
    assert 'id="7"' in by_idx[7] and "<val>49</val>" in by_idx[7]

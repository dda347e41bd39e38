"""Tests for the remaining helper surface: guarded dates, JSON extraction,
fallbacks, IVF assignment, rolling fingerprints, renamed-TSV reads."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdm_data_loader_utils_spark.functions.scalars import (
    coalesce_fallback,
    guarded_date,
    json_get_first,
    row_to_json,
)
from cdm_data_loader_utils_spark.operators.similarity import ivf_assign
from cdm_data_loader_utils_spark.operators.text_analysis import rolling_fingerprints
from cdm_data_loader_utils_spark.sources.dsv import read_csv_inferred, read_tsv_renamed


def test_guarded_date(spark):
    df = spark.createDataFrame([("20240131",), ("not-a-date",), ("2024013",)], ["d"])
    got = [r[0] for r in df.select(guarded_date("d")).collect()]
    assert str(got[0]) == "2024-01-31" and got[1] is None and got[2] is None


def test_json_get_first_and_row_to_json(spark):
    df = spark.createDataFrame(
        [('{"a": {"b": "x"}}',), ('{"c": "y"}',)], ["j"]
    )
    got = [r[0] for r in df.select(json_get_first("j", "$.a.b", "$.c")).collect()]
    assert got == ["x", "y"]
    row = spark.createDataFrame([("k1", 5)], ["k", "v"]).select(
        row_to_json("k", "v").alias("j")
    ).collect()[0]
    import json

    assert json.loads(row.j) == {"k": "k1", "v": 5}


def test_coalesce_fallback(spark):
    df = spark.createDataFrame([(None, "fb"), ("p", "fb")], ["a", "b"])
    got = [r[0] for r in df.select(coalesce_fallback("a", "b")).collect()]
    assert got == ["fb", "p"]


def test_ivf_assign(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.2]), (3, [0.0, 1.0])], schema
    )
    out = ivf_assign(df, centroids=[[1.0, 0.0], [0.0, 1.0]])
    got = {r.vec_id: r.centroid_id for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1}


def test_rolling_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z z z")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.fingerprints for r in rolling_fingerprints(df, window=3).collect()}
    assert out[1] == out[2]  # identical text → identical fingerprint sets
    assert out[1] != out[3]
    assert len(out[1]) == 3  # 5 tokens, window 3 → 3 shingles


def test_read_tsv_renamed(spark, tmp_path):
    p = os.path.join(tmp_path, "x.tsv")
    with open(p, "w") as f:
        f.write("# comment line\n")
        f.write("a\t1\nb\t2\n")
    df = read_tsv_renamed(spark, p, ["k", "v"])
    assert {(r.k, r.v) for r in df.collect()} == {("a", "1"), ("b", "2")}


def test_read_csv_inferred(spark, tmp_path):
    p = os.path.join(tmp_path, "y.csv")
    with open(p, "w") as f:
        f.write("k,v\na,1\nb,2\n")
    df = read_csv_inferred(spark, p)
    assert dict(df.dtypes)["v"] in ("int", "bigint")
    assert df.count() == 2

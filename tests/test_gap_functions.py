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


def test_safe_coercions_null_on_garbage_under_ansi(spark):
    """Spark 4 ships ANSI on: a single malformed value must yield null, not
    abort the job (try_cast / try_to_date paths)."""
    from cdm_data_loader_utils_spark.functions.scalars import (
        guarded_date,
        percent_to_fraction,
        safe_float,
        safe_int,
    )

    df = spark.createDataFrame(
        [("abc", "xyz%", "99999999"), ("1,234", "42%", "20260101")],
        ["num", "pct", "d"],
    )
    rows = df.select(
        safe_int("num").alias("i"),
        safe_float("num").alias("f"),
        percent_to_fraction("pct").alias("p"),
        guarded_date("d").alias("dt"),
    ).collect()
    bad, good = rows[0], rows[1]
    assert bad.i is None and bad.f is None and bad.p is None and bad.dt is None
    assert good.i == 1234 and good.p == 0.42 and str(good.dt) == "2026-01-01"


def test_fingerprint_distinguishes_null_positions(spark):
    """concat_ws alone skips nulls, colliding ('x', NULL, 'b') with
    ('x', 'b', NULL) — null-marking must keep them distinct."""
    from cdm_data_loader_utils_spark.functions.scalars import (
        deterministic_id,
        sha256_fingerprint,
    )

    df = spark.createDataFrame(
        [("x", None, "b"), ("x", "b", None), ("x", None, None)],
        ["a", "b", "c"],
    )
    out = df.select(
        sha256_fingerprint("a", "b", "c").alias("h"),
        deterministic_id("a", "b", "c").alias("u"),
    ).collect()
    assert len({r.h for r in out}) == 3
    assert len({r.u for r in out}) == 3


def test_split_corrupt_counts_are_queryable(spark, tmp_path):
    """Counting the corrupt/clean splits must not die on Spark's
    corrupt-record column-pruning restriction."""
    from cdm_data_loader_utils_spark.sources.dsv import read_dsv, split_corrupt

    from pyspark.sql import types as T

    p = tmp_path / "x.tsv"
    p.write_text("1\ta\n2\tb\nbroken\trow\textra\n3\tc\n")
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ])
    df = read_dsv(spark, str(p), schema=schema, delimiter="\t")
    clean, corrupt = split_corrupt(df)
    assert corrupt.count() == 1
    assert clean.count() == 3


def test_delimited_records_crlf_and_corrupt_gz(spark, tmp_path):
    from cdm_data_loader_utils_spark.sources.records import read_delimited_records

    (tmp_path / "a.fa").write_bytes(b">h1 desc\r\nACGT\r\nTTTT\r\n")
    (tmp_path / "bad.fa.gz").write_bytes(b"\x1f\x8b\x08\x00garbage-truncated")
    out = read_delimited_records(spark, str(tmp_path) + "/*").collect()
    ok = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert len(ok) == 1 and ok[0].header == "h1 desc" and ok[0].body == "ACGT\nTTTT"
    assert len(bad) == 1 and bad[0].path.endswith("bad.fa.gz")

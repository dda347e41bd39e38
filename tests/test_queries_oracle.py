"""Driver-gate mirror: a fast subset of queries() compared value-for-value
against oracle_sql() via DuckDB at sf0.001 (full sweep: tools/check_oracles.py)."""

from __future__ import annotations

import math

import duckdb
import pytest

from cdm_data_loader_utils_spark import queries as Q

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SUBSET = [
    "lww_latest_turn",
    "cdc_replay_final_state",
    "snapshot_diff_classify",
    "pricing_summary",
    "exact_dedup",
    "jaccard_near_dups",
    "cosine_topk",
    "text_profile",
    "lake_delete",
    "sha_fingerprints",
    "lake_stream_ingest",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, name):
    sdf = Q.queries()[name](spark, SF)
    cols = sorted(sdf.columns)
    got = sorted(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    od = con.execute(Q.oracle_sql()[name]).fetchdf()
    assert sorted(od.columns) == cols
    exp = sorted(
        tuple(_canon(v) for v in row)
        for row in od[cols].itertuples(index=False, name=None)
    )
    assert len(got) == len(exp)
    assert got == exp


def test_latest_two_events_matches_oracle_off_gate(spark, con):
    """q_latest_two_events was rotated OFF the 50-slot driver gate in favor
    of lake_stream_ingest (O1's plan shape stays gated via cosine_topk);
    this keeps its oracle equality checked in pytest."""
    sdf = Q.q_latest_two_events(spark, SF)
    cols = sorted(sdf.columns)
    got = sorted(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    od = con.execute(Q._LATEST2_ORACLE).fetchdf()
    assert sorted(od.columns) == cols
    exp = sorted(
        tuple(_canon(v) for v in row)
        for row in od[cols].itertuples(index=False, name=None)
    )
    assert got == exp and len(got) == 2

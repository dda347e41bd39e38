"""Shared local-Spark fixture (mirror of the reference's
``/root/reference/tests/conftest.py:44-71``: per-session SparkSession, tmp
warehouse, small shuffle-partition count)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from cdm_data_loader_utils_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cdc-engine-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture()
def warehouse():
    d = tempfile.mkdtemp(prefix="lake_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def assert_df_equal(actual, expected, key_cols):
    """Order-insensitive row-dict comparison (reference tests/helpers.py:20-34)."""
    a = sorted(
        (tuple(sorted(r.asDict().items())) for r in actual.collect()),
    )
    e = sorted(
        (tuple(sorted(r.asDict().items())) for r in expected.collect()),
    )
    assert a == e, (
        f"row mismatch: {len(a)} vs {len(e)} rows; "
        f"first diff: {next(((x, y) for x, y in zip(a, e) if x != y), None)}"
    )

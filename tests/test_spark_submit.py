"""Deployment-path smoke: the engine must run via ``spark-submit
--py-files`` (north rule: "run via spark-submit --py-files on
multi-executor clusters"). Packages the library as a zip, ships it the way
a cluster submit would, and replays events through the CLI entry point in a
fresh driver process that imports ONLY from the shipped zip."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cdm_data_loader_utils_spark"


def _build_zip(target: str) -> str:
    zpath = os.path.join(target, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.slow
def test_spark_submit_py_files_replay(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")
    zpath = _build_zip(str(tmp_path))
    driver = tmp_path / "job.py"
    driver.write_text(
        "import sys\n"
        f"from {PKG}.cli import main\n"
        "main(sys.argv[1:])\n"
    )
    events = str(tmp_path / "events")
    table = str(tmp_path / "table")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}

    def submit(*args):
        return subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zpath, str(driver), *args,
            ],
            capture_output=True, text=True, env=env, timeout=420,
        )

    r1 = submit("generate", "--out", events, "--n-events", "20000",
                "--batch-size", "5000")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = submit("replay", "--events-dir", events, "--table", table,
                "--run-id", "submit-run", "--buckets", "8")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "rows applied" in r2.stdout
    # idempotence across submits: a second spark-submit of the same run is
    # fully fenced out by the snapshot log
    r3 = submit("replay", "--events-dir", events, "--table", table,
                "--run-id", "submit-run", "--buckets", "8")
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "0 rows applied" in r3.stdout


@pytest.mark.slow
def test_spark_submit_py_files_lake_stream_source(tmp_path):
    """The format('lake') Python DataSource under the deployment path: its
    schema/partition planning AND executor-side read() run in python
    workers that must import the module from the --py-files zip."""
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")
    zpath = _build_zip(str(tmp_path))
    driver = tmp_path / "stream_job.py"
    driver.write_text(
        "import sys, os\n"
        f"from {PKG}.session import get_spark\n"
        f"from {PKG}.lake.table import LakeTable\n"
        f"from {PKG}.streaming.lake_source import register_lake_source\n"
        "from pyspark.sql import types as T\n"
        "spark = get_spark(master='local[4]', shuffle_partitions=8)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "register_lake_source(spark)\n"
        "root, out, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]\n"
        "schema = T.StructType([T.StructField('k', T.StringType()),\n"
        "                       T.StructField('v', T.IntegerType())])\n"
        "t = LakeTable.create(spark, os.path.join(root, 't'), schema,\n"
        "                     bucket_by='k', bucket_count=2)\n"
        "t.append(spark.createDataFrame([(f'k{i}', i) for i in range(25)], schema))\n"
        "t.append(spark.createDataFrame([(f'x{i}', i) for i in range(15)], schema))\n"
        "q = (spark.readStream.format('lake').load(t.path)\n"
        "     .writeStream.format('parquet').option('path', out)\n"
        "     .option('checkpointLocation', ckpt)\n"
        "     .trigger(availableNow=True).start())\n"
        "q.awaitTermination()\n"
        "n = spark.read.parquet(out).count()\n"
        "assert n == 40, n\n"
        "b = spark.read.format('lake').load(t.path).count()\n"
        "assert b == 40, b\n"
        "print('STREAMED', n, 'BATCH', b)\n"
    )
    r = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath, str(driver),
            str(tmp_path / "wh"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
        ],
        capture_output=True, text=True, env=dict(os.environ), timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "STREAMED 40 BATCH 40" in r.stdout

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

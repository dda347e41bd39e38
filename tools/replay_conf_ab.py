"""ABBA test of session-conf candidates on the replay job (fresh process per
leg; conf via env). Usage:
    python tools/replay_conf_ab.py '<json-conf>' [trials] [events]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from cdm_data_loader_utils_spark.session import get_spark
import bench
conf = json.loads(os.environ.get("AB_CONF", "{{}}"))
spark = get_spark(app_name="ab-leg", master="local[32]",
                  shuffle_partitions=32, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
dt, n = bench.bench_replay_throughput(spark, int(os.environ["AB_EVENTS"]))
print(json.dumps({{"sec": dt, "events": n}}))
"""


def run_leg(conf: dict, events: int) -> float:
    env = dict(os.environ, AB_CONF=json.dumps(conf), AB_EVENTS=str(events))
    out = subprocess.run(
        [sys.executable, "-c", LEG.format(repo=REPO)],
        env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["sec"]


def main() -> None:
    conf = json.loads(sys.argv[1])
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    events = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000
    a_times, b_times = [], []
    for i in range(trials):
        for side in ("ABBA" if i % 2 == 0 else "BAAB"):
            t = run_leg({} if side == "A" else conf, events)
            (a_times if side == "A" else b_times).append(t)
            print(f"{side}: {t:.2f}s", flush=True)
    print(f"A (baseline) median {statistics.median(a_times):.2f}s {sorted(a_times)}")
    print(f"B (candidate) median {statistics.median(b_times):.2f}s {sorted(b_times)}")


if __name__ == "__main__":
    main()

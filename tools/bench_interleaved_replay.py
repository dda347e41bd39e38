"""Interleaved old-vs-new regression bench for the REPLAY family — the
per-round adjudication protocol (BENCH/BASELINE.md) extended to
``lww_latest_turn``, ``cdc_replay_final_state`` and ``cdc_replay_synthetic``
(the r4 verdict's #1 item: these legs drifted +11-12% raw between rounds
with no interleaved evidence either way).

Protocol: the old commit is cloned to /tmp (shared parquet inputs, its own
package code); each trial runs A,B,B,A (old,new,new,old) fresh subprocesses
in ONE session window so every leg samples the same host-noise band;
medians per side are reported. The CURRENT bench.py is copied into the old
clone (it only harnesses; all engine code imports from the clone's package)
so both sides honor BENCH_ONLY_QUERIES.

    python tools/bench_interleaved_replay.py --old-commit <sha> --trials 3
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

QUERIES = ["lww_latest_turn", "cdc_replay_final_state"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def clone_old(commit: str) -> str:
    dst = f"/tmp/replay_old_{commit[:8]}"
    if not os.path.isdir(dst):
        subprocess.run(["git", "clone", "-q", REPO, dst], check=True)
        subprocess.run(["git", "-C", dst, "checkout", "-q", commit], check=True)
    # current harness over old engine code (see module docstring)
    shutil.copy(os.path.join(REPO, "bench.py"), os.path.join(dst, "bench.py"))
    return dst


def run_leg(repo: str, events: int, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY_QUERIES=",".join(QUERIES),
        BENCH_REPLAY_EVENTS=str(events),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=repo, env=env,
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    doc = json.loads(line)
    res = dict(doc["queries"])
    res["events_per_sec"] = doc["events_per_sec"]
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-commit", required=True)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    old = clone_old(args.old_commit)
    sides: dict[str, list[dict]] = {"old": [], "new": []}
    for t in range(args.trials):
        for side in ("old", "new", "new", "old"):
            repo = old if side == "old" else REPO
            r = run_leg(repo, args.events, args.cpus)
            sides[side].append(r)
            print(f"# trial {t} {side}: {r}", file=sys.stderr, flush=True)

    summary = {}
    keys = QUERIES + ["cdc_replay_synthetic", "events_per_sec"]
    for k in keys:
        o = statistics.median(r[k] for r in sides["old"])
        n = statistics.median(r[k] for r in sides["new"])
        summary[k] = {"old_median": o, "new_median": n,
                      "old_all": sorted(r[k] for r in sides["old"]),
                      "new_all": sorted(r[k] for r in sides["new"])}
    print(json.dumps({"old_commit": args.old_commit,
                      "events": args.events, "cpus": args.cpus,
                      "runs_per_side": 2 * args.trials,
                      "summary": summary}))


if __name__ == "__main__":
    main()

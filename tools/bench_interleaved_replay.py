"""Interleaved old-vs-new regression bench — the per-round adjudication
protocol (BENCH/BASELINE.md), generalized from the replay family to ANY
query list (r5 verdict item 2: interleave the FULL headline suite every
round, so no family's raw drift is ever left unadjudicated for a round).

Protocol: the old commit is cloned to /tmp (shared parquet inputs, its own
package code); each trial runs A,B,B,A (old,new,new,old) fresh subprocesses
in ONE session window so every leg samples the same host-noise band;
medians per side are reported. The CURRENT bench.py is copied into the old
clone (it only harnesses; all engine code imports from the clone's package)
so both sides honor BENCH_ONLY_QUERIES / BENCH_SKIP_REPLAY.

    # full headline suite incl. the synthetic replay job (default)
    python tools/bench_interleaved_replay.py --old-commit <sha> --trials 3
    # one family, replay job skipped per leg
    python tools/bench_interleaved_replay.py --old-commit <sha> \
        --queries simhash_near_dups,minhash_lsh_near_dups --trials 3
    # replay family only (the original r5 protocol)
    python tools/bench_interleaved_replay.py --old-commit <sha> --queries replay
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPLAY_QUERIES = ["lww_latest_turn", "cdc_replay_final_state"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def clone_old(commit: str) -> str:
    dst = f"/tmp/replay_old_{commit[:8]}"
    if not os.path.isdir(dst):
        subprocess.run(["git", "clone", "-q", REPO, dst], check=True)
        subprocess.run(["git", "-C", dst, "checkout", "-q", commit], check=True)
    # current harness over old engine code (see module docstring)
    shutil.copy(os.path.join(REPO, "bench.py"), os.path.join(dst, "bench.py"))
    return dst


def run_leg(repo: str, queries: list[str] | None, with_replay: bool,
            events: int, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_REPLAY_EVENTS=str(events),
    )
    if queries is not None:
        env["BENCH_ONLY_QUERIES"] = ",".join(queries)
    else:
        env.pop("BENCH_ONLY_QUERIES", None)  # full headline suite
    if not with_replay:
        env["BENCH_SKIP_REPLAY"] = "1"
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=repo, env=env,
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    doc = json.loads(line)
    res = dict(doc["queries"])
    if "events_per_sec" in doc:
        res["events_per_sec"] = doc["events_per_sec"]
    res["suite_total"] = doc["value"]
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-commit", required=True)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--queries", default="all",
        help="'all' = full headline suite + replay job (default); "
             "'replay' = lww/final-state + replay job; else a comma list "
             "of query names (replay job included only if "
             "cdc_replay_synthetic is listed)")
    args = ap.parse_args()

    if args.queries == "all":
        queries, with_replay = None, True
    elif args.queries == "replay":
        queries, with_replay = REPLAY_QUERIES, True
    else:
        named = [q for q in args.queries.split(",") if q]
        with_replay = "cdc_replay_synthetic" in named
        queries = [q for q in named if q != "cdc_replay_synthetic"]

    old = clone_old(args.old_commit)
    sides: dict[str, list[dict]] = {"old": [], "new": []}
    for t in range(args.trials):
        for side in ("old", "new", "new", "old"):
            repo = old if side == "old" else REPO
            r = run_leg(repo, queries, with_replay, args.events, args.cpus)
            sides[side].append(r)
            print(f"# trial {t} {side}: {r}", file=sys.stderr, flush=True)

    summary = {}
    keys = sorted(set(sides["old"][0]) & set(sides["new"][0]))
    for k in keys:
        o = statistics.median(r[k] for r in sides["old"] if k in r)
        n = statistics.median(r[k] for r in sides["new"] if k in r)
        summary[k] = {"old_median": o, "new_median": n,
                      "new_over_old": round(n / o, 3) if o else None,
                      "old_all": sorted(r.get(k) for r in sides["old"]),
                      "new_all": sorted(r.get(k) for r in sides["new"])}
    print(json.dumps({"old_commit": args.old_commit,
                      "queries": args.queries,
                      "events": args.events, "cpus": args.cpus,
                      "runs_per_side": 2 * args.trials,
                      "summary": summary}))


if __name__ == "__main__":
    main()

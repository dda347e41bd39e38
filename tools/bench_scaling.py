"""Scaling-efficiency bench: run the identical job at two parallelism levels
(local[N] vs local[4N]) on the same input and report throughput at both plus
efficiency = (thr_4N / thr_N) / 4.

Sandbox proxy for the north rule's "N and 4N executors with ≥0.8 scaling
efficiency" (no real cluster available — see BASELINE.md). Each level runs in
a fresh subprocess so the JVM/executor pool is sized exactly to the level.

Writes BENCH/BASELINE.md. Usage:
    python tools/bench_scaling.py [--events 2000000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, events: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["BENCH_REPLAY_EVENTS"] = str(events)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    d["wall_sec"] = round(time.time() - t0, 1)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism level")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=2,
                    help="interleaved trials per level; best run kept")
    args = ap.parse_args()

    n, n4 = args.n, args.n * 4
    # interleave A/B/A/B and take the best run per level: this sandbox hosts
    # other tenants (load >4 with zero local JVMs observed), so a single
    # pass can land one leg on a noisy window and invert the comparison
    runs_lo, runs_hi = [], []
    for trial in range(args.trials):
        print(f"== trial {trial} local[{n}] ==", file=sys.stderr)
        runs_lo.append(run_level(n, args.events, args.sf_dir))
        print(f"== trial {trial} local[{n4}] ==", file=sys.stderr)
        runs_hi.append(run_level(n4, args.events, args.sf_dir))
    lo = max(runs_lo, key=lambda d: d["events_per_sec"])
    hi = max(runs_hi, key=lambda d: d["events_per_sec"])

    thr_lo, thr_hi = lo["events_per_sec"], hi["events_per_sec"]
    eff = (thr_hi / thr_lo) / 4.0
    # headline query-suite scaling (sum of per-query seconds excl. replay)
    q_lo = sum(v for k, v in lo["queries"].items() if k != "cdc_replay_synthetic")
    q_hi = sum(v for k, v in hi["queries"].items() if k != "cdc_replay_synthetic")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured throughput & scaling efficiency

North-rule criterion: ≥0.8 throughput scaling efficiency from N to 4N
executors (`BASELINE.json` `north_rule`). No real cluster exists in this
sandbox, so (per driver instruction) the identical job runs at two local
parallelism levels on the same input.

## CDC replay throughput (primary metric)

Synthetic transcript change-event replay (out-of-order LSNs, hot keys,
duplicates, schema wave) through the full exactly-once path: validate →
salted LWW dedup → copy-on-write MERGE into the bucketed lake table.

| level | events | replay sec | events/sec |
|---|---|---|---|
| local[{n}] (N) | {lo["replay_events"]} | {lo["queries"]["cdc_replay_synthetic"]} | {thr_lo} |
| local[{n4}] (4N) | {hi["replay_events"]} | {hi["queries"]["cdc_replay_synthetic"]} | {thr_hi} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}** (target ≥ 0.8)

Methodology: {args.trials} interleaved trials per level, best run kept per
level (the sandbox shares a host with other tenants — load >4 observed with
zero local JVMs — so single-pass comparisons can land one leg on a noisy
window). All-trial throughputs (events/sec):
N = {[r["events_per_sec"] for r in runs_lo]}, 4N = {[r["events_per_sec"] for r in runs_hi]}.

## Headline query suite ({args.sf_dir})

| query | local[{n}] sec | local[{n4}] sec |
|---|---|---|
""")
        for k in lo["queries"]:
            f.write(f"| {k} | {lo['queries'][k]} | {hi['queries'].get(k, '—')} |\n")
        f.write(f"""| **suite total (excl. replay)** | **{q_lo:.2f}** | **{q_hi:.2f}** |

## Reproduce

```bash
python tools/bench_scaling.py --events {args.events} --n {n}
# single level:
SPARK_GRAFT_CPUS={n4} BENCH_REPLAY_EVENTS={args.events} python bench.py
```

Notes: small-SF query timings are dominated by fixed job-submission
overheads and do NOT scale with cores (expected); the replay metric is the
scaling-relevant one — its work (window dedup shuffle, merge joins, bucketed
parquet writes) grows with data volume and parallelizes across the
{n4}-thread pool the way it would across executors.
""")
    print(json.dumps({
        "n": n, "n4": n4, "events": args.events,
        "thr_n": thr_lo, "thr_4n": thr_hi, "efficiency": round(eff, 3),
        "written": md,
    }))


if __name__ == "__main__":
    main()

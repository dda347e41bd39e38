"""Two-hop WAL-tail throughput: producer appends change events to a lake
INBOX table (hop 1), ``tail_lake_events`` streams the inbox's snapshot log
through ``format("lake")`` and merges exactly-once into the transcript
table (hop 2). Reports both hops plus final-state oracle equality — the
number that says what the engine-native binlog bridge costs vs the direct
parquet-directory replay (``bench.py``'s ``cdc_replay_synthetic``).

    python tools/bench_tail_lake.py --events 4000000 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--inbox-commits", type=int, default=4)
    args = ap.parse_args()

    from cdm_data_loader_utils_spark.lake.table import LakeTable
    from cdm_data_loader_utils_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_data_loader_utils_spark.session import get_spark
    from cdm_data_loader_utils_spark.sources.events import (
        expected_final_state,
        generate_change_events,
    )
    from cdm_data_loader_utils_spark.streaming.replay import tail_lake_events

    spark = get_spark(app_name="bench-tail-lake",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_tail_")

    events = generate_change_events(
        spark,
        n_events=args.events,
        n_convs=max(1000, args.events // 1000),
        turns_per_conv=50,
        seed=42,
        ooo_window=10_000,
        batch_size=max(1, args.events // args.inbox_commits),
        tool_from_lsn=args.events // 2,
    ).persist()
    n = events.count()
    bids = sorted(r.batch_id for r in events.select("batch_id").distinct().collect())

    inbox = LakeTable.create(
        spark, os.path.join(tmp, "inbox"), events.drop("batch_id").schema,
        bucket_by="conv_id", bucket_count=args.buckets,
    )
    t0 = time.perf_counter()
    for b in bids:
        inbox.append(events.filter(F.col("batch_id") == b).drop("batch_id"),
                     fence_key=f"prod:{b}")
    produce_sec = time.perf_counter() - t0

    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", bucket_count=args.buckets,
    )
    t0 = time.perf_counter()
    tail_lake_events(spark, inbox, table, None, "bench-tail",
                     os.path.join(tmp, "ckpt"), max_snapshots_per_trigger=1)
    tail_sec = time.perf_counter() - t0

    exp = expected_final_state(events)
    got = table.read()
    ok = (got.exceptAll(exp.select(*got.columns)).count() == 0
          and exp.select(*got.columns).exceptAll(got).count() == 0)

    print(json.dumps({
        "events": n,
        "inbox_commits": len(bids),
        "produce_sec": round(produce_sec, 1),
        "produce_ev_s": int(n / produce_sec),
        "tail_sec": round(tail_sec, 1),
        "tail_ev_s": int(n / tail_sec),
        "final_state_equal": ok,
        "cpus": args.cpus,
        "buckets": args.buckets,
    }))


if __name__ == "__main__":
    main()

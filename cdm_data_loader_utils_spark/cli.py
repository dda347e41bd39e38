"""CLI entry points (reference analogue: the per-pipeline CLIs registered in
``/root/reference/pyproject.toml`` and ``parsers/refseq_pipeline/cli/*``).

    python -m cdm_data_loader_utils_spark.cli replay   --events-dir ... --table ... [--stream]
    python -m cdm_data_loader_utils_spark.cli generate --out ... --n-events 1000000
    python -m cdm_data_loader_utils_spark.cli compact  --table ... [--purge-below-lsn N]
    python -m cdm_data_loader_utils_spark.cli metrics  --warehouse ... --run-id ...
"""

from __future__ import annotations

import argparse
import sys
import uuid

from .session import get_spark


def cmd_generate(args) -> None:
    from .sources.events import generate_change_events

    spark = get_spark("cdc-generate")
    ev = generate_change_events(
        spark,
        n_events=args.n_events,
        n_convs=args.n_convs,
        seed=args.seed,
        batch_size=args.batch_size,
        tool_from_lsn=args.tool_from_lsn,
    )
    ev.write.parquet(args.out, mode="overwrite")
    print(f"wrote {ev.count()} events to {args.out}")


def cmd_replay(args) -> None:
    from .audit.tables import AuditStore
    from .lake.table import LakeTable
    from .schemas import TRANSCRIPT_SCHEMA
    from .streaming.replay import replay_batches, stream_events

    spark = get_spark("cdc-replay")
    if LakeTable.exists(args.table):
        table = LakeTable.load(spark, args.table)
    else:
        table = LakeTable.create(
            spark, args.table, TRANSCRIPT_SCHEMA,
            bucket_by="conv_id", bucket_count=args.buckets,
        )
    audit = AuditStore(spark, args.warehouse) if args.warehouse else None
    run_id = args.run_id or ("run-" + uuid.uuid4().hex[:8])
    if args.stream:
        stream_events(
            spark, args.events_dir, table, audit, run_id,
            checkpoint_dir=args.checkpoint_dir or (args.table + "_ckpt"),
        )
    else:
        events = spark.read.parquet(args.events_dir)
        results = replay_batches(events, table, audit, run_id)
        applied = sum(r.rows_applied for r in results)
        print(f"run {run_id}: {len(results)} batches, {applied} rows applied, "
              f"snapshot {table.snapshot_id}")
    if audit is not None:
        print(audit.summary_json(run_id))


def cmd_compact(args) -> None:
    from .lake.table import LakeTable

    spark = get_spark("cdc-compact")
    table = LakeTable.load(spark, args.table)
    if args.incremental:
        table.compact_buckets(
            min_files=args.min_files,
            purge_tombstones_below_lsn=args.purge_below_lsn,
            target_files_per_bucket=args.files_per_bucket,
        )
    else:
        table.compact(
            purge_tombstones_below_lsn=args.purge_below_lsn,
            target_files_per_bucket=args.files_per_bucket,
            sort_by=args.sort_by.split(",") if args.sort_by else None,
        )
    removed = table.expire_snapshots(keep_last=args.keep_snapshots)
    print(f"compacted; expired {removed} orphan files; "
          f"{len(table.files())} live files")


def cmd_sql(args) -> None:
    """Register every catalog table as a view, then run one SQL statement —
    the reference's register-table-and-view + ad-hoc query surface."""
    from .lake.catalog import Catalog

    spark = get_spark("cdc-sql")
    cat = Catalog(spark, args.warehouse)
    views = cat.register_views()
    print(f"registered {len(views)} view(s): {', '.join(sorted(views))}")
    if args.query:
        spark.sql(args.query).show(args.max_rows, truncate=False)


def cmd_metrics(args) -> None:
    from .audit.tables import AuditStore

    spark = get_spark("cdc-metrics")
    audit = AuditStore(spark, args.warehouse)
    print(audit.summary_json(args.run_id))
    audit.lineage_report(args.run_id).show(50, truncate=False)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="cdc-engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--out", required=True)
    g.add_argument("--n-events", type=int, default=1_000_000)
    g.add_argument("--n-convs", type=int, default=1000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--batch-size", type=int, default=100_000)
    g.add_argument("--tool-from-lsn", type=int, default=None)
    g.set_defaults(fn=cmd_generate)

    r = sub.add_parser("replay")
    r.add_argument("--events-dir", required=True)
    r.add_argument("--table", required=True)
    r.add_argument("--warehouse", default=None)
    r.add_argument("--run-id", default=None)
    r.add_argument("--buckets", type=int, default=64)
    r.add_argument("--stream", action="store_true")
    r.add_argument("--checkpoint-dir", default=None)
    r.set_defaults(fn=cmd_replay)

    c = sub.add_parser("compact")
    c.add_argument("--table", required=True)
    c.add_argument("--purge-below-lsn", type=int, default=None)
    c.add_argument("--keep-snapshots", type=int, default=3)
    c.add_argument("--files-per-bucket", type=int, default=1)
    c.add_argument("--sort-by", default=None,
                   help="comma-separated columns to cluster files by "
                        "(ZORDER-style: enables stats-based range pruning)")
    c.add_argument("--incremental", action="store_true",
                   help="per-bucket small-file compaction (compact_buckets) "
                        "instead of a full-table rewrite")
    c.add_argument("--min-files", type=int, default=2,
                   help="with --incremental: compact buckets holding >= N files")
    c.set_defaults(fn=cmd_compact)

    q = sub.add_parser("sql")
    q.add_argument("--warehouse", required=True)
    q.add_argument("--query", default=None)
    q.add_argument("--max-rows", type=int, default=50)
    q.set_defaults(fn=cmd_sql)

    m = sub.add_parser("metrics")
    m.add_argument("--warehouse", required=True)
    m.add_argument("--run-id", required=True)
    m.set_defaults(fn=cmd_metrics)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])

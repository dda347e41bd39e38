"""CLI entry points (reference analogue: the per-pipeline CLIs registered in
``/root/reference/pyproject.toml`` and ``parsers/refseq_pipeline/cli/*``).

    python -m cdm_data_loader_utils_spark.cli replay   --events-dir ... --table ... [--stream]
    python -m cdm_data_loader_utils_spark.cli generate --out ... --n-events 1000000
    python -m cdm_data_loader_utils_spark.cli compact  --table ... [--purge-below-lsn N]
    python -m cdm_data_loader_utils_spark.cli metrics  --warehouse ... --run-id ...
    python -m cdm_data_loader_utils_spark.cli maintain --table ... [--apply] [--apply-rebucket]
    python -m cdm_data_loader_utils_spark.cli replicate --src ... --dst ... --key-cols k --state-dir ...
    python -m cdm_data_loader_utils_spark.cli refresh-views --warehouse ... [--names a.t,b.u]
    python -m cdm_data_loader_utils_spark.cli rollback --table ... --snapshot-id N | --tag name

Every lifecycle operation an operator schedules from cron has a command —
the reference ships one console script per operation
(``/root/reference/pyproject.toml:20-30``)."""

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


def cmd_maintain(args) -> None:
    """Print table_stats + maintenance_plan (metadata-only); with --apply,
    run the plan's incremental compaction + snapshot expiry; with
    --apply-rebucket, additionally run the recommended full re-bucket (a
    table rewrite — separate opt-in on purpose)."""
    import json as _json

    from .lake.table import LakeTable

    spark = get_spark("cdc-maintain")
    table = LakeTable.load(spark, args.table)
    plan = table.maintenance_plan(
        max_files_per_bucket=args.max_files_per_bucket,
        target_rows_per_bucket=args.target_rows_per_bucket,
        max_snapshots=args.max_snapshots,
    )
    print(_json.dumps(plan, indent=2, sort_keys=True))
    if not (args.apply or args.apply_rebucket):
        return
    actions: list[str] = []
    if args.apply_rebucket and plan["rebucket_to"]:
        table.compact(new_bucket_count=plan["rebucket_to"])
        actions.append(f"rebucketed to {plan['rebucket_to']}")
    elif plan["compact_unbucketed"]:
        table.compact()
        actions.append("compacted (full: unbucketed file group)")
    elif plan["compact_buckets"]:
        table.compact_buckets(bucket_keys=plan["compact_buckets"])
        actions.append(f"compacted {len(plan['compact_buckets'])} bucket(s)")
    removed = table.expire_snapshots(keep_last=args.keep_snapshots,
                                     grace_seconds=args.grace_seconds)
    actions.append(f"expired {removed} file(s)")
    print("applied: " + "; ".join(actions)
          + f"; {len(table.files())} live files, snapshot {table.snapshot_id}")


def cmd_replicate(args) -> None:
    """One incremental sync of src → dst (resumable via --state-dir). The
    destination is created on first run with the source's user schema and
    bucket layout (override the count with --dst-buckets)."""
    import json as _json

    from .lake.replicate import Replicator
    from .lake.table import LakeTable

    spark = get_spark("cdc-replicate")
    src = LakeTable.load(spark, args.src)
    if LakeTable.exists(args.dst, spark=spark):
        dst = LakeTable.load(spark, args.dst)
    else:
        snap = src.snapshot()
        dst = LakeTable.create(
            spark, args.dst, src.user_schema,
            bucket_by=snap.get("bucket_by"),
            bucket_count=args.dst_buckets or snap.get("bucket_count") or 16,
        )
    rep = Replicator(
        src, dst, args.key_cols.split(","), args.state_dir,
        name=args.name, validate_keys=args.validate_keys,
    )
    print(_json.dumps(rep.sync(), sort_keys=True))


def cmd_refresh_views(args) -> None:
    """Re-point the warehouse's registered SQL views at each table's current
    snapshot — metadata-only no-op when nothing moved, from ANY process."""
    from .lake.catalog import Catalog

    spark = get_spark("cdc-refresh-views")
    cat = Catalog(spark, args.warehouse)
    names = args.names.split(",") if args.names else None
    refreshed = cat.refresh_views(names)
    if refreshed:
        print(f"re-pointed {len(refreshed)} view(s): "
              + ", ".join(sorted(refreshed)))
    else:
        print("all views current; nothing re-pointed")


def cmd_rollback(args) -> None:
    """Restore a table to a previous snapshot (by id or tag) as a new
    committed, auditable operation — metadata-only, history preserved."""
    from .lake.table import LakeTable

    spark = get_spark("cdc-rollback")
    table = LakeTable.load(spark, args.table)
    was = table.snapshot_id
    sid = table.rollback_to(args.snapshot_id, tag=args.tag)
    print(f"rolled back {args.table}: snapshot {was} -> {sid} "
          f"(restored state of "
          f"{args.tag if args.tag else args.snapshot_id})")


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

    mt = sub.add_parser("maintain")
    mt.add_argument("--table", required=True)
    mt.add_argument("--apply", action="store_true",
                    help="run the plan's compaction + expire_snapshots")
    mt.add_argument("--apply-rebucket", action="store_true",
                    help="also run the recommended re-bucket (full table "
                         "rewrite) when the plan suggests one")
    mt.add_argument("--max-files-per-bucket", type=int, default=8)
    mt.add_argument("--target-rows-per-bucket", type=int, default=10_000_000)
    mt.add_argument("--max-snapshots", type=int, default=1_000)
    mt.add_argument("--keep-snapshots", type=int, default=3)
    mt.add_argument("--grace-seconds", type=float, default=600.0)
    mt.set_defaults(fn=cmd_maintain)

    rp = sub.add_parser("replicate")
    rp.add_argument("--src", required=True)
    rp.add_argument("--dst", required=True)
    rp.add_argument("--key-cols", required=True,
                    help="comma-separated replication key columns")
    rp.add_argument("--state-dir", required=True)
    rp.add_argument("--name", default=None)
    rp.add_argument("--dst-buckets", type=int, default=None)
    rp.add_argument("--validate-keys", action="store_true")
    rp.set_defaults(fn=cmd_replicate)

    rv = sub.add_parser("refresh-views")
    rv.add_argument("--warehouse", required=True)
    rv.add_argument("--names", default=None,
                    help="comma-separated subset (default: every "
                         "catalog-registered table)")
    rv.set_defaults(fn=cmd_refresh_views)

    rb = sub.add_parser("rollback")
    rb.add_argument("--table", required=True)
    rb.add_argument("--snapshot-id", type=int, default=None)
    rb.add_argument("--tag", default=None)
    rb.set_defaults(fn=cmd_rollback)

    args = p.parse_args(argv)
    if args.cmd == "rollback" and (args.snapshot_id is None) == (args.tag is None):
        p.error("rollback: pass exactly one of --snapshot-id / --tag")
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])

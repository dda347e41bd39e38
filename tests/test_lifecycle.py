"""Lifecycle-parity tests: targeted UPDATE + no-op warning, run-level status
state machine, multi-table fan-out, write modes, name catalog, single-file
CSV export — mirrors of the reference's run/update/sink behaviors
(``/root/reference/src/cdm_data_loader_utils/audit/run.py:33-114``,
``utils/spark_delta.py:135-224``, ``pipelines/uniprot_kb_pipeline.py:46-75``,
``cli/detect_updates.py:99-102``)."""

from __future__ import annotations

import os
import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_data_loader_utils_spark.audit.tables import AuditStore
from cdm_data_loader_utils_spark.lake.catalog import Catalog
from cdm_data_loader_utils_spark.lake.table import LakeTable, write_table

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


# ----------------------------------------------------------------- update
def test_update_targets_only_matching_files(spark, warehouse):
    t = LakeTable.create(
        spark, os.path.join(warehouse, "t"), SCHEMA, bucket_by="k", bucket_count=8
    )
    t.append(_df(spark, [(f"k{i}", i) for i in range(32)]))
    files_before = {f.path for f in t.files()}
    sid, n = t.update(F.col("k") == "k3", {"v": F.lit(999)})
    assert n == 1
    assert t.snapshot()["summary"]["rows_updated"] == 1
    got = {(r.k, r.v) for r in t.read().collect()}
    assert ("k3", 999) in got and len(got) == 32
    carried = files_before & {f.path for f in t.files()}
    assert carried, "files without matches must carry forward unchanged"


def test_update_noop_warns_and_commits_nothing(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, [("a", 1)]))
    sid_before = t.snapshot_id
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sid, n = t.update(F.col("k") == "missing", {"v": F.lit(0)})
    assert n == 0 and sid == sid_before == t.snapshot_id
    assert any("0 rows" in str(x.message) for x in w)


def test_update_skips_tombstones(spark, warehouse):
    t = LakeTable.create(
        spark, os.path.join(warehouse, "t"), SCHEMA, bucket_by="k", bucket_count=2
    )
    src = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    t.merge_cdc(
        spark.createDataFrame([("a", 1, "i", 1), ("b", 2, "d", 2)], src),
        key_cols=["k"],
    )
    _, n = t.update(F.col("v").isNotNull(), {"v": F.col("v") + 100})
    assert n == 1  # only the live row; the tombstone is not "updated"
    assert {(r.k, r.v) for r in t.read().collect()} == {("a", 101)}


# ----------------------------------------------------------------- delete
def test_delete_removes_matching_keeps_null(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, [("a", 1), ("b", 2), ("c", None)]))
    sid, n = t.delete(F.col("v") >= 2)
    assert n == 1
    # SQL DELETE three-valued logic: condition-NULL rows are KEPT
    assert {(r.k, r.v) for r in t.read().collect()} == {("a", 1), ("c", None)}
    assert t.snapshot()["summary"]["rows_deleted"] == 1


def test_delete_drops_fully_matching_file_without_rewrite(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, [("a", 1), ("b", 2)]))   # file 1: all v < 10
    t.append(_df(spark, [("x", 11), ("y", 12)]))  # file 2: all v >= 10
    _, n = t.delete(F.col("v") >= 10)
    assert n == 2
    s = t.snapshot()["summary"]
    # every touched file matched in full → dropped outright, ZERO rewrites
    assert s["files_dropped"] >= 1 and s["files_rewritten"] == 0
    assert {(r.k, r.v) for r in t.read().collect()} == {("a", 1), ("b", 2)}


def test_delete_noop_warns_and_commits_nothing(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, [("a", 1)]))
    sid_before = t.snapshot_id
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sid, n = t.delete(F.col("k") == "missing")
    assert n == 0 and sid == sid_before == t.snapshot_id
    assert any("0 rows" in str(x.message) for x in w)


def test_delete_preserves_tombstones_then_merge_lww(spark, warehouse):
    """Deleting live rows must not scrub OTHER keys' tombstones: a late
    lower-LSN resurrect of a tombstoned key still loses after the delete."""
    t = LakeTable.create(
        spark, os.path.join(warehouse, "t"), SCHEMA, bucket_by="k", bucket_count=2
    )
    src = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    t.merge_cdc(
        spark.createDataFrame([("a", 1, "i", 1), ("b", 2, "i", 2)], src),
        key_cols=["k"],
    )
    t.merge_cdc(
        spark.createDataFrame([("b", None, "d", 3)], src), key_cols=["k"]
    )
    # delete the live row "a"; the b-tombstone must survive the rewrite
    _, n = t.delete(F.col("k") == "a")
    assert n == 1
    assert t.read().count() == 0
    # late out-of-order resurrect of b (lsn 1 < tombstone lsn 3) must lose
    t.merge_cdc(
        spark.createDataFrame([("b", 99, "i", 1)], src), key_cols=["k"]
    )
    assert t.read().count() == 0


def test_delete_physical_is_not_lsn_fenced_but_tombstone_is(spark, warehouse):
    """Documented CDC interplay: a PHYSICAL delete leaves no LSN fence, so a
    late out-of-order event (lower lsn than the deleted row) re-inserts the
    key; delete(tombstone_lsn=...) writes a CDC tombstone instead and wins
    last-writer-wins against the same straggler."""
    src = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )

    def fresh(name):
        t = LakeTable.create(
            spark, os.path.join(warehouse, name), SCHEMA,
            bucket_by="k", bucket_count=2,
        )
        t.merge_cdc(
            spark.createDataFrame([("a", 1, "i", 100), ("b", 2, "i", 100)], src),
            key_cols=["k"],
        )
        return t

    # physical removal: straggler with lsn 50 < 100 resurrects "a"
    phys = fresh("phys")
    _, n = phys.delete(F.col("k") == "a")
    assert n == 1
    phys.merge_cdc(
        spark.createDataFrame([("a", 99, "i", 50)], src), key_cols=["k"])
    assert {(r.k, r.v) for r in phys.read().collect()} == {("b", 2), ("a", 99)}

    # tombstoning delete: same straggler loses LWW against lsn 500
    tomb = fresh("tomb")
    _, n = tomb.delete(F.col("k") == "a", tombstone_lsn=500)
    assert n == 1
    assert tomb.snapshot()["summary"]["mode"] == "tombstone"
    assert {(r.k, r.v) for r in tomb.read().collect()} == {("b", 2)}
    tomb.merge_cdc(
        spark.createDataFrame([("a", 99, "i", 50)], src), key_cols=["k"])
    assert {(r.k, r.v) for r in tomb.read().collect()} == {("b", 2)}
    # ...but a genuinely NEWER event (lsn 600 > 500) re-creates the key
    tomb.merge_cdc(
        spark.createDataFrame([("a", 7, "i", 600)], src), key_cols=["k"])
    assert {(r.k, r.v) for r in tomb.read().collect()} == {("b", 2), ("a", 7)}

    # the stamp is CLAMPED to the row's own lsn: a row at lsn 700 deleted
    # with tombstone_lsn=500 must fence a straggler at lsn 600 — writing
    # the literal 500 would let it resurrect
    clamp = fresh("clamp")
    clamp.merge_cdc(
        spark.createDataFrame([("a", 5, "u", 700)], src), key_cols=["k"])
    clamp.delete(F.col("k") == "a", tombstone_lsn=500)
    clamp.merge_cdc(
        spark.createDataFrame([("a", 42, "i", 600)], src), key_cols=["k"])
    assert {(r.k, r.v) for r in clamp.read().collect()} == {("b", 2)}


def test_delete_tombstone_lsn_requires_cdc_meta_columns(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, [("a", 1)]))
    with pytest.raises(ValueError, match="meta columns"):
        t.delete(F.col("k") == "a", tombstone_lsn=10)


def test_delete_where_hint_prunes_probe(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, [("a", 1), ("b", 2)]).coalesce(1))
    t.append(_df(spark, [("x", 100), ("y", 200)]).coalesce(1))
    n_files = len(t.files())
    _, n = t.delete(F.col("v") > 150, where=[("v", ">", 150)])
    assert n == 1
    # the hint must have NARROWED the probe: only the high-range file's
    # stats admit v > 150, so fewer candidates than live files were probed
    probed = t.snapshot()["summary"]["files_probed"]
    assert probed < n_files, (probed, n_files)
    assert probed == 1
    assert {(r.k, r.v) for r in t.read().collect()} == {
        ("a", 1), ("b", 2), ("x", 100)
    }


# --------------------------------------------------------- change data feed
def test_changes_between_snapshots(spark, warehouse):
    """Delta-CDF-style changes(): inserts, updates, predicate deletes and
    CDC tombstones all classify correctly between two snapshots, with
    schema evolution aligned on the old side."""
    t = LakeTable.create(
        spark, os.path.join(warehouse, "t"), SCHEMA, bucket_by="k",
        bucket_count=4,
    )
    src = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    t.merge_cdc(
        spark.createDataFrame(
            [("a", 1, "i", 1), ("b", 2, "i", 2), ("c", 3, "i", 3)], src),
        key_cols=["k"])
    v_from = t.snapshot_id
    t.merge_cdc(
        spark.createDataFrame(
            [("b", 20, "u", 4), ("d", 4, "i", 5), ("c", None, "d", 6)], src),
        key_cols=["k"])
    t.delete(F.col("k") == "a")
    got = {
        (r.k, r.change_type, r.old_v, r.new_v)
        for r in t.changes(["k"], v_from).collect()
    }
    assert got == {
        ("a", "deleted", 1, None),
        ("b", "updated", 2, 20),
        ("c", "deleted", 3, None),
        ("d", "new", None, 4),
    }
    # to_change_events bridges the feed back into a MERGE-ready envelope
    from cdm_data_loader_utils_spark.operators.snapshot_diff import (
        to_change_events,
    )
    ev = to_change_events(t.changes(["k"], v_from), ["k"], ["v"])
    assert {(r.k, r.op) for r in ev.collect()} == {
        ("a", "d"), ("b", "u"), ("c", "d"), ("d", "i")
    }


def test_changes_skips_unchanged_buckets(spark, warehouse):
    """Manifest-level pruning: buckets whose manifest ref is identical
    between snapshots are excluded from the diff scan entirely."""
    t = LakeTable.create(
        spark, os.path.join(warehouse, "t"), SCHEMA, bucket_by="k",
        bucket_count=8,
    )
    t.append(_df(spark, [(f"k{i}", i) for i in range(64)]))
    v_from = t.snapshot_id
    # touch exactly one key → at most one bucket's manifest changes
    _, n = t.update(F.col("k") == "k7", {"v": F.lit(700)})
    assert n == 1
    old_e, new_e = t._changed_bucket_entries(
        t.snapshot(v_from), t.snapshot())
    all_files = len(t.files())
    assert len(new_e) < all_files, (len(new_e), all_files)
    got = {(r.k, r.change_type) for r in t.changes(["k"], v_from).collect()}
    assert got == {("k7", "updated")}
    # soundness guards: pruning self-disables when the bucket column is not
    # part of the diff key (a key's rows could move buckets unseen) — the
    # diff still runs, unpruned and correct
    assert t._bucket_pruning_sound(["k"], t.snapshot(v_from), t.snapshot())
    assert not t._bucket_pruning_sound(["v"], t.snapshot(v_from), t.snapshot())
    got_by_v = {
        (r.v, r.change_type) for r in t.changes(["v"], v_from).collect()
    }
    assert got_by_v == {(7, "deleted"), (700, "new")}


def test_changes_validate_keys_raises_on_duplicates(spark, warehouse):
    """The one-row-per-key contract of changes() is documented; the opt-in
    validate_keys=True makes a violation (duplicate-key plain append) a loud
    ValueError instead of a silently misclassified feed."""
    t = LakeTable.create(
        spark, os.path.join(warehouse, "t"), SCHEMA, bucket_by="k",
        bucket_count=4,
    )
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    v_from = t.snapshot_id
    t.append(_df(spark, [("b", 20)]))  # duplicate key "b" on the new side
    # default: documented contract only — no validation cost, no raise
    t.changes(["k"], v_from).collect()
    with pytest.raises(ValueError, match="duplicate"):
        t.changes(["k"], v_from, validate_keys=True).collect()
    # a clean table passes the validated path
    c = LakeTable.create(
        spark, os.path.join(warehouse, "c"), SCHEMA, bucket_by="k",
        bucket_count=4,
    )
    c.append(_df(spark, [("a", 1), ("b", 2)]))
    v0 = c.snapshot_id
    c.update(F.col("k") == "b", {"v": F.lit(22)})
    got = {
        (r.k, r.change_type)
        for r in c.changes(["k"], v0, validate_keys=True).collect()
    }
    assert got == {("b", "updated")}


def test_changes_feed_replicates_downstream_table(spark, warehouse):
    """CDC-out feeds CDC-in: replaying changes() through to_change_events →
    merge_cdc after every upstream commit keeps a downstream replica equal
    to the source — the incremental-sync composition a lakehouse mirror
    runs, never a full copy."""
    from cdm_data_loader_utils_spark.operators.snapshot_diff import (
        to_change_events,
    )

    src_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    up = LakeTable.create(
        spark, os.path.join(warehouse, "up"), SCHEMA, bucket_by="k",
        bucket_count=4,
    )
    down = LakeTable.create(
        spark, os.path.join(warehouse, "down"), SCHEMA, bucket_by="k",
        bucket_count=2,  # replica layout may differ
    )
    steps = [
        [("a", 1, "i", 1), ("b", 2, "i", 2)],
        [("b", 20, "u", 3), ("c", 3, "i", 4)],
        [("a", None, "d", 5), ("d", 4, "i", 6)],
    ]
    last_synced = up.snapshot_id
    for batch in steps:
        up.merge_cdc(spark.createDataFrame(batch, src_schema), key_cols=["k"])
        feed = up.changes(["k"], last_synced)
        # per-sync lsn_offset: a key re-synced later carries the SAME hash
        # base + a larger offset, so LWW prefers the newer increment
        ev = to_change_events(feed, ["k"], ["v"], lsn_offset=up.snapshot_id)
        down.merge_cdc(ev, key_cols=["k"])
        last_synced = up.snapshot_id
        got_up = {(r.k, r.v) for r in up.read().collect()}
        got_down = {(r.k, r.v) for r in down.read().collect()}
        assert got_up == got_down, (got_up, got_down)
    assert {(r.k, r.v) for r in down.read().collect()} == {
        ("b", 20), ("c", 3), ("d", 4)
    }


# --------------------------------------------------------- run state machine
def test_run_state_machine(spark, warehouse):
    audit = AuditStore(spark, warehouse)
    audit.start_run("r1")
    assert audit.run_status("r1") == "RUNNING"
    assert audit.complete_run("r1") == 1
    assert audit.run_status("r1") == "SUCCESS"
    # completing again is a warned no-op (no RUNNING row left)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert audit.complete_run("r1") == 0
    assert any("0 rows" in str(x.message) for x in w)

    audit.start_run("r2")
    assert audit.fail_run("r2", "boom") == 1
    assert audit.run_status("r2") == "ERROR"
    err = (
        audit.runs.read().filter(F.col("run_id") == "r2").collect()[0]["error"]
    )
    assert err == "boom"


def test_replay_records_run_lifecycle(spark, warehouse):
    from cdm_data_loader_utils_spark.schemas import TRANSCRIPT_SCHEMA
    from cdm_data_loader_utils_spark.sources.events import generate_change_events
    from cdm_data_loader_utils_spark.streaming.replay import replay_batches

    events = generate_change_events(spark, 2000, n_convs=10, seed=3, batch_size=1000)
    table = LakeTable.create(
        spark, os.path.join(warehouse, "tr"), TRANSCRIPT_SCHEMA,
        bucket_by="conv_id", bucket_count=4,
    )
    audit = AuditStore(spark, warehouse)
    replay_batches(events, table, audit, "run-x")
    assert audit.run_status("run-x") == "SUCCESS"


# ------------------------------------------------------------------ fan-out
def test_multi_table_fanout_exactly_once(spark, warehouse):
    from cdm_data_loader_utils_spark.streaming.replay import apply_batch_fanout

    evens = LakeTable.create(spark, os.path.join(warehouse, "evens"), SCHEMA)
    odds = LakeTable.create(spark, os.path.join(warehouse, "odds"), SCHEMA)
    batch = _df(spark, [(f"k{i}", i) for i in range(10)])
    routes = {
        "evens": (evens, lambda df: df.filter(F.col("v") % 2 == 0)),
        "odds": (odds, lambda df: df.filter(F.col("v") % 2 == 1)),
    }
    apply_batch_fanout(batch, routes, "runA", 0)
    assert evens.read().count() == 5 and odds.read().count() == 5
    # replaying the same batch is fenced out PER TABLE
    apply_batch_fanout(batch, routes, "runA", 0)
    assert evens.read().count() == 5 and odds.read().count() == 5


# -------------------------------------------------------------- write modes
def test_write_modes_matrix(spark, warehouse):
    p = os.path.join(warehouse, "t")
    write_table(spark, p, _df(spark, [("a", 1)]), mode="append")
    write_table(spark, p, _df(spark, [("b", 2)]), mode="append")
    assert LakeTable.load(spark, p).read().count() == 2
    write_table(spark, p, _df(spark, [("z", 9)]), mode="overwrite")
    assert [(r.k, r.v) for r in LakeTable.load(spark, p).read().collect()] == [("z", 9)]
    # ignore: existing table untouched
    write_table(spark, p, _df(spark, [("q", 7)]), mode="ignore")
    assert LakeTable.load(spark, p).read().count() == 1
    with pytest.raises(FileExistsError):
        write_table(spark, p, _df(spark, [("q", 7)]), mode="errorifexists")
    with pytest.raises(ValueError):
        write_table(spark, p, _df(spark, [("q", 7)]), mode="bogus")


def test_write_empty_df_skipped_but_table_created(spark, warehouse):
    p = os.path.join(warehouse, "t")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = write_table(spark, p, spark.createDataFrame([], SCHEMA))
    assert any("empty" in str(x.message).lower() for x in w)
    assert LakeTable.exists(p) and t.read().count() == 0
    assert t.snapshot_id == 1  # no data commit happened


# ------------------------------------------------------------------ catalog
def test_catalog_name_addressing(spark, warehouse):
    cat = Catalog(spark, warehouse)
    t = cat.create_table("bronze.transcripts", SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, [("a", 1)]))
    assert cat.exists("bronze.transcripts")
    t2 = cat.load_table("bronze.transcripts")
    assert t2.read().count() == 1
    assert cat.resolve("bronze.transcripts").endswith("bronze/transcripts")
    assert "bronze.transcripts" in cat.tables()
    cat.register("silver.ext", os.path.join(warehouse, "elsewhere"))
    assert cat.resolve("silver.ext").endswith("elsewhere")
    cat.drop("silver.ext")
    with pytest.raises(KeyError):
        cat.resolve("silver.ext")


# ---------------------------------------------------------------- csv export
def test_export_single_csv(spark, tmp_path):
    from cdm_data_loader_utils_spark.sources.dsv import export_single_csv

    df = _df(spark, [("a", 1), ("b", 2)])
    target = str(tmp_path / "out.csv")
    export_single_csv(df.orderBy("k"), target)
    lines = open(target).read().strip().splitlines()
    assert lines[0] == "k,v" and set(lines[1:]) == {"a,1", "b,2"}
    assert not os.path.exists(target + ".__tmp__")


def test_start_run_is_idempotent_on_resume(spark, warehouse):
    """Review regression: resuming a crashed run must not stack a second
    RUNNING row (finish transitions would rewrite both)."""
    audit = AuditStore(spark, warehouse)
    audit.start_run("r")
    audit.start_run("r")  # resume of the same run
    running = (
        audit.runs.read()
        .filter((F.col("run_id") == "r") & (F.col("status") == "RUNNING"))
        .count()
    )
    assert running == 1
    assert audit.complete_run("r") == 1


def test_catalog_drop_missing_is_noop(spark, warehouse):
    cat = Catalog(spark, warehouse)
    cat.register("a.t")
    cat.drop("nope")  # must not raise or disturb existing entries
    assert "a.t" in cat.tables()


# ------------------------------------------------------------- replication
def test_replicator_incremental_resume_and_reconcile(spark, warehouse):
    """First-class incremental replication: sync() ships only the changed
    range with a durable watermark, no-ops when nothing moved, and falls
    back to a full reconciliation (including deletes) when the watermark
    is lost or expired upstream."""
    from cdm_data_loader_utils_spark.lake.replicate import Replicator

    src_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    up = LakeTable.create(spark, os.path.join(warehouse, "up"), SCHEMA,
                          bucket_by="k", bucket_count=4)
    down = LakeTable.create(spark, os.path.join(warehouse, "down"), SCHEMA,
                            bucket_by="k", bucket_count=2)
    rep = Replicator(up, down, ["k"], os.path.join(warehouse, "repl_state"))

    def eq():
        a = {(r.k, r.v) for r in up.read().collect()}
        b = {(r.k, r.v) for r in down.read().collect()}
        assert a == b, (a, b)

    up.merge_cdc(spark.createDataFrame(
        [("a", 1, "i", 1), ("b", 2, "i", 2)], src_schema), key_cols=["k"])
    r1 = rep.sync()
    assert r1["mode"] == "reconcile" and r1["events"] == 2  # bootstrap
    eq()
    up.merge_cdc(spark.createDataFrame(
        [("b", 20, "u", 3), ("c", 3, "i", 4), ("a", None, "d", 5)],
        src_schema), key_cols=["k"])
    r2 = rep.sync()
    assert r2["mode"] == "incremental" and r2["events"] == 3
    eq()
    assert rep.sync()["mode"] == "noop"
    assert rep.watermark() == up.snapshot_id

    # re-delivery of an already-shipped range is fenced to a no-op commit
    dst_sid = down.snapshot_id
    rep2 = Replicator(up, down, ["k"],
                      os.path.join(warehouse, "repl_state2"))
    # rep2 has no watermark → reconcile; src==dst so the diff ships nothing
    r3 = rep2.sync()
    assert r3["mode"] == "reconcile" and r3["events"] == 0
    assert down.snapshot_id == dst_sid

    # lost/expired watermark + destination drift → reconcile ships DELETES
    down.merge_cdc(spark.createDataFrame(
        [("zz", 99, "i", 1)], src_schema), key_cols=["k"])  # dst-only row
    up.expire_snapshots(keep_last=1, grace_seconds=0)
    rep3 = Replicator(up, down, ["k"],
                      os.path.join(warehouse, "repl_state3"))
    r4 = rep3.sync()
    assert r4["mode"] == "reconcile" and r4["events"] >= 1
    eq()  # zz tombstoned in dst

    # steady state after upstream schema evolution flows through the merge
    wide = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType()),
         T.StructField("w", T.IntegerType()),
         T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    up.merge_cdc(spark.createDataFrame([("d", 4, 40, "i", 6)], wide),
                 key_cols=["k"])
    rep3.sync()
    got = {(r.k, r.v, r.w) for r in down.read().collect()}
    assert ("d", 4, 40) in got


def test_replicator_crash_window_net_zero_key_converges(spark, warehouse):
    """The two-phase intent protocol's reason to exist: a sync that merged
    but crashed before advancing the watermark, followed by an upstream
    DELETE of the key it shipped. A naive resume would diff the WIDENED
    range (key absent at both endpoints → no event) and strand the key
    live in the replica forever; the recorded intent re-ships the exact
    crashed range instead, so the next sync sees the delete."""
    from cdm_data_loader_utils_spark.lake.replicate import Replicator

    src_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    up = LakeTable.create(spark, os.path.join(warehouse, "up"), SCHEMA,
                          bucket_by="k", bucket_count=4)
    down = LakeTable.create(spark, os.path.join(warehouse, "down"), SCHEMA,
                            bucket_by="k", bucket_count=2)
    rep = Replicator(up, down, ["k"], os.path.join(warehouse, "state"))
    up.merge_cdc(spark.createDataFrame([("a", 1, "i", 1)], src_schema),
                 key_cols=["k"])
    rep.sync()
    w = rep.watermark()

    # crashed sync: K inserted upstream, intent recorded, merge APPLIED,
    # watermark never advanced (process died here)
    up.merge_cdc(spark.createDataFrame([("K", 7, "i", 2)], src_schema),
                 key_cols=["k"])
    x = up.snapshot_id
    v, st = rep._state()
    rep._write_state(v + 1, {"from_snapshot": w, "pending": [w, x]})
    rep._ship(w, x)
    assert {(r.k, r.v) for r in down.read().collect()} == {("a", 1), ("K", 7)}

    # upstream deletes K before the replicator comes back
    up.merge_cdc(spark.createDataFrame([("K", None, "d", 3)], src_schema),
                 key_cols=["k"])
    r = rep.sync()   # resumes the recorded [w, x] range; fence absorbs it
    assert r["resumed"] and r["to"] == x
    r2 = rep.sync()  # now ships x→latest, which carries the delete
    assert r2["events"] == 1 and not r2["resumed"]
    assert {(r_.k, r_.v) for r_ in down.read().collect()} == {("a", 1)}
    assert rep.sync()["mode"] == "noop"


# ------------------------------------------------------------- maintenance
def test_table_stats_and_maintenance_plan(spark, warehouse):
    """Metadata-only layout observability: stats add up to the manifest
    truth, the plan flags exactly the buckets needing compaction, and
    running the suggested compaction clears the plan."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=4)
    for wave in range(3):
        t.append(_df(spark, [(f"k{i}", i + wave * 100) for i in range(16)]))
    s = t.table_stats()
    assert s["rows"] == 48
    assert s["files"] == len(t.files())
    assert sum(b["files"] for b in s["buckets"].values()) == s["files"]
    assert s["schema_groups"] == 1 and s["bucket_count"] == 4

    plan = t.maintenance_plan(max_files_per_bucket=2)
    assert plan["compact_buckets"], "3 appends x 4 buckets must exceed 2 files somewhere"
    t.compact_buckets(bucket_keys=plan["compact_buckets"])
    plan2 = t.maintenance_plan(max_files_per_bucket=2)
    assert plan2["compact_buckets"] == []
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (f"k{i}", i + w * 100) for i in range(16) for w in range(3)
    }

    # growth lever: tiny target → suggests a power-of-two re-bucket; a
    # huge target suggests nothing (and never a SHRINK)
    plan3 = t.maintenance_plan(target_rows_per_bucket=4)
    assert plan3["rebucket_to"] in (16, 32) and \
        plan3["rebucket_to"] & (plan3["rebucket_to"] - 1) == 0
    assert t.maintenance_plan(target_rows_per_bucket=10**9)["rebucket_to"] is None

    # unbucketed tables must not read as "all clear": their file group is
    # invisible to compact_buckets, so the plan flags a full compact()
    u = LakeTable.create(spark, os.path.join(warehouse, "u"), SCHEMA)
    for wave in range(3):
        u.append(_df(spark, [(f"k{i}", i) for i in range(4)]).coalesce(1))
    pu = u.maintenance_plan(max_files_per_bucket=2)
    assert pu["compact_buckets"] == [] and pu["compact_unbucketed"]
    u.compact()
    assert not u.maintenance_plan(max_files_per_bucket=2)["compact_unbucketed"]


def test_replicator_racing_syncs_lose_loudly(spark, warehouse):
    """Two replicators on one state_dir: the docstring promise is that the
    loser surfaces as FileExistsError, never last-writer-wins. Simulated
    deterministically: A reads state, B completes a full clean sync, A then
    proceeds from its stale read — its intent write targets the version
    slot B already claimed. Destination state must equal one clean sync."""
    from cdm_data_loader_utils_spark.lake.replicate import Replicator

    src_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    up = LakeTable.create(spark, os.path.join(warehouse, "up"), SCHEMA,
                          bucket_by="k", bucket_count=4)
    down = LakeTable.create(spark, os.path.join(warehouse, "down"), SCHEMA,
                            bucket_by="k", bucket_count=2)
    state = os.path.join(warehouse, "state")
    rep_a = Replicator(up, down, ["k"], state)
    rep_b = Replicator(up, down, ["k"], state)
    up.merge_cdc(spark.createDataFrame(
        [("a", 1, "i", 1), ("b", 2, "i", 2)], src_schema), key_cols=["k"])

    stale = rep_a._state()        # A reads...
    r_b = rep_b.sync()            # ...B wins the race with a full sync
    assert r_b["events"] == 2
    rep_a._state = lambda: stale  # A proceeds from its stale read
    with pytest.raises(FileExistsError):
        rep_a.sync()
    # destination equals one clean sync's result; no duplicate application
    assert {(r.k, r.v) for r in down.read().collect()} == {("a", 1), ("b", 2)}
    assert rep_b.watermark() == up.snapshot_id


def test_replicator_warns_when_state_prune_fails(spark, warehouse):
    """State pruning is best-effort, but a PERSISTENT delete failure must
    stay observable — one warning per unprunable version, sync still
    succeeds."""
    from cdm_data_loader_utils_spark.lake.replicate import Replicator

    src_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    up = LakeTable.create(spark, os.path.join(warehouse, "up"), SCHEMA,
                          bucket_by="k", bucket_count=2)
    down = LakeTable.create(spark, os.path.join(warehouse, "down"), SCHEMA,
                            bucket_by="k", bucket_count=2)
    rep = Replicator(up, down, ["k"], os.path.join(warehouse, "state"))
    for i in range(4):  # build up >4 state versions so pruning has work
        up.merge_cdc(spark.createDataFrame(
            [(f"k{i}", i, "i", i + 1)], src_schema), key_cols=["k"])
        rep.sync()

    def boom(_path):
        raise OSError("injected delete failure")

    rep._log.fs.delete = boom
    up.merge_cdc(spark.createDataFrame(
        [("z", 99, "i", 100)], src_schema), key_cols=["k"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r = rep.sync()
    assert r["events"] == 1, "sync itself must still succeed"
    assert any("failed to prune state" in str(x.message) for x in w)


# --------------------------------------------------------------- rollback
def test_rollback_restores_data_schema_and_layout(spark, warehouse):
    """rollback_to is a metadata-only RESTORE: data, schema, and bucket
    layout revert to the target; history is preserved (roll forward by
    rolling back to a pre-rollback id)."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=4)
    t.append(_df(spark, [(f"k{i}", i) for i in range(10)]))
    good = t.snapshot_id
    files_at_good = {f.path for f in t.files()}
    # later history: schema evolution + re-bucket + a delete
    widened = T.StructType(SCHEMA.fields + [T.StructField("w", T.DoubleType())])
    t.append(_df(spark, [("x1", 100, 1.5)], widened))
    t.compact(new_bucket_count=8)
    t.delete(F.col("v") < 5)
    assert t.read().count() == 6

    sid = t.rollback_to(good)
    assert sid == t.snapshot_id and sid > good  # NEW commit, not a rewind
    snap = t.snapshot()
    assert snap["operation"] == "rollback"
    assert snap["summary"]["rollback_of"] == good
    assert snap["bucket_count"] == 4  # layout restored across the re-bucket
    assert [f.name for f in t.user_schema.fields] == ["k", "v"]  # schema too
    assert {f.path for f in t.files()} == files_at_good  # zero data rewritten
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {(f"k{i}", i) for i in range(10)}
    # merge into the rolled-back layout stays bucket-sound
    upd = _df(spark, [("k3", 999, 10, "u")], T.StructType(SCHEMA.fields + [
        T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType()),
    ]))
    t.merge_cdc(upd, key_cols=["k"], lsn_col="lsn", op_col="op")
    assert {r.v for r in t.read().filter(F.col("k") == "k3").collect()} == {999}

    # roll FORWARD: the pre-rollback state is itself addressable
    t.rollback_to(sid - 1)
    assert t.read().count() == 6 and t.snapshot()["bucket_count"] == 8


def test_rollback_by_tag_noop_and_expire_pinning(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    t.tag("rel")
    t.overwrite(_df(spark, [("c", 3)]))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        same = t.rollback_to(t.snapshot_id)
    assert same == t.snapshot_id
    assert any("already current" in str(x.message) for x in w)

    sid = t.rollback_to(tag="rel")
    assert {(r.k, r.v) for r in t.read().collect()} == {("a", 1), ("b", 2)}
    # the rollback snapshot retention-pins the restored files on its own:
    # expire everything but the latest (drops the tag too) and re-read
    t.drop_tag("rel")
    t.expire_snapshots(keep_last=1, grace_seconds=0.0)
    assert {(r.k, r.v) for r in t.read().collect()} == {("a", 1), ("b", 2)}
    assert t.snapshot_id == sid


def test_rollback_keeps_fences_so_replayed_batches_stay_deduped(spark, warehouse):
    """Fence history survives a rollback: a batch applied BEFORE the target
    does not double-apply when re-delivered after the restore — re-ingest
    needs a new run_id (documented contract)."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, [("a", 1)]), fence_key="run1:0")
    base = t.snapshot_id
    applied_at = t.append(_df(spark, [("b", 2)]), fence_key="run1:1")
    t.rollback_to(base)
    sid_after = t.snapshot_id
    # fenced: returns where the batch ORIGINALLY applied, commits nothing
    assert t.append(_df(spark, [("b", 2)]), fence_key="run1:1") == applied_at
    assert t.snapshot_id == sid_after
    assert t.read().count() == 1


def test_rollback_requires_a_target(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, [("a", 1)]))
    with pytest.raises(ValueError, match="pass a target"):
        t.rollback_to()

"""Round-3 lake read-path features: per-file column stats, predicate-based
file skipping, sorted (clustered) writes, timestamp time travel, the
spark.sql view bridge, and the maintenance/catalog hardening items.

Reference analogues: Delta per-file stats + OPTIMIZE ZORDER
(``/root/reference/src/cdm_data_loader_utils/parsers/refseq_pipeline/core/
spark_delta.py:144-150``) and register-table-and-view
(``parsers/gene_association_file.py:225-242``)."""

from __future__ import annotations

import datetime
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_data_loader_utils_spark.lake.catalog import Catalog
from cdm_data_loader_utils_spark.lake.fs import _is_already_exists
from cdm_data_loader_utils_spark.lake.table import (
    LakeTable,
    _encode_pred_value,
    _encode_stat,
    _file_skippable,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def _rows(n, base_day=1):
    return [
        (f"k{i:04d}", i, datetime.datetime(2026, 1, base_day, 0, 0, i % 60))
        for i in range(n)
    ]


def _df(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------------- stats
def test_file_stats_collected_for_fixed_width_columns(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(40)))
    entries = t.files()
    assert entries
    for fe in entries:
        assert fe.stats is not None
        # fixed-width columns get bounds by default; strings do not
        assert "v" in fe.stats and "ts" in fe.stats
        assert "k" not in fe.stats
        lo, hi = fe.stats["v"]
        assert lo is not None and hi is not None and lo <= hi
    # global min/max across files must cover the data
    los = [fe.stats["v"][0] for fe in entries]
    his = [fe.stats["v"][1] for fe in entries]
    assert min(los) == 0 and max(his) == 39


def test_string_stats_opt_in_with_safe_truncation(spark, warehouse):
    t = LakeTable.create(
        spark, os.path.join(warehouse, "t"),
        T.StructType([T.StructField("s", T.StringType()),
                      T.StructField("v", T.IntegerType())]),
        properties={"stats.columns": ["s"]},
    )
    long_lo = "a" * 100
    long_hi = "z" * 100
    t.append(
        _df(spark, [(long_lo, 1), (long_hi, 2)], schema="s string, v int")
        .coalesce(1)
    )
    (fe,) = t.files()
    lo, hi = fe.stats["s"]
    # truncated MIN prefix is a valid lower bound; truncated MAX is dropped
    assert lo == "a" * 64
    assert hi is None
    # short strings keep exact bounds
    t2 = LakeTable.create(
        spark, os.path.join(warehouse, "t2"),
        T.StructType([T.StructField("s", T.StringType())]),
        properties={"stats.columns": ["s"]},
    )
    t2.append(spark.createDataFrame([("b",), ("m",)], "s string").coalesce(1))
    (fe2,) = t2.files()
    assert fe2.stats["s"] == ["b", "m"]


def test_file_skippable_rules():
    stats = {"v": [10, 20], "s": ["b", None]}
    assert _file_skippable(stats, [("v", ">", 20)])
    assert _file_skippable(stats, [("v", ">=", 21)])
    assert _file_skippable(stats, [("v", "<", 10)])
    assert _file_skippable(stats, [("v", "<=", 9)])
    assert _file_skippable(stats, [("v", "=", 25)])
    assert _file_skippable(stats, [("v", "in", [1, 2, 30])])
    assert not _file_skippable(stats, [("v", "=", 15)])
    assert not _file_skippable(stats, [("v", "in", [15])])
    assert not _file_skippable(stats, [("v", "!=", 15)])  # never prunes
    # unbounded max side never prunes upward
    assert not _file_skippable(stats, [("s", ">", "zzz")])
    assert _file_skippable(stats, [("s", "<", "a")])
    # missing stats / unknown column → conservative keep
    assert not _file_skippable(None, [("v", "=", 1)])
    assert not _file_skippable({}, [("v", "=", 1)])
    assert not _file_skippable(stats, [("other", "=", 1)])


def test_encode_stat_timestamp_and_date_ordering():
    a = _encode_stat(datetime.datetime(2026, 1, 1))
    b = _encode_stat(datetime.datetime(2026, 1, 2))
    assert a < b
    assert _encode_stat(datetime.date(2026, 1, 1)) < _encode_stat(
        datetime.date(2026, 1, 2)
    )


def test_read_where_prunes_files_and_filters_rows(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(30, base_day=1)))
    t.append(_df(spark, _rows(30, base_day=5)))
    # cluster by ts so per-file ranges become disjoint and prunable
    t.compact(sort_by=["ts"], target_files_per_bucket=3)
    cutoff = datetime.datetime(2026, 1, 5)
    scanned, skipped = t.plan_files(where=[("ts", ">=", cutoff)])
    assert skipped, "stats-based skipping eliminated no files"
    # every skipped file's max ts is provably below the cutoff (NTZ bounds
    # are fixed-format wall-clock strings — session-timezone independent)
    enc = _encode_pred_value(cutoff, T.TimestampNTZType(), "UTC")
    for fe in skipped:
        assert fe.stats["ts"][1] is not None and fe.stats["ts"][1] < enc
    got = t.read(where=[("ts", ">=", cutoff)])
    want = t.read().filter(F.col("ts") >= F.lit(cutoff))
    assert got.count() == want.count() == 30
    # result equality, not just counts
    assert {r.k for r in got.collect()} == {r.k for r in want.collect()}


def test_compact_sort_by_gives_disjoint_per_file_ranges(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=1)
    import random

    rows = _rows(120)
    random.Random(7).shuffle(rows)
    t.append(_df(spark, rows))
    t.compact(sort_by=["v"], target_files_per_bucket=4)
    entries = [fe for fe in t.files() if fe.rows > 0]
    assert len(entries) > 1, "compaction produced a single file; test is vacuous"
    ranges = sorted((fe.stats["v"][0], fe.stats["v"][1]) for fe in entries)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {ranges}"
    # the sort property persists for subsequent writes
    assert t.snapshot()["properties"]["write.sort_by"] == ["v"]
    t.append(_df(spark, _rows(10)))
    assert t.read().count() == 130


# ------------------------------------------------------------- time travel
def test_timestamp_time_travel(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, _rows(3)))
    ts_v2 = t.snapshot()["timestamp_ms"]
    time.sleep(0.05)
    t.append(_df(spark, _rows(3, base_day=9)))
    assert t.read().count() == 6
    assert t.read(as_of_timestamp_ms=ts_v2).count() == 3
    assert t.snapshot(as_of_timestamp_ms=ts_v2)["snapshot_id"] == 2
    with pytest.raises(FileNotFoundError):
        t.snapshot(as_of_timestamp_ms=ts_v2 - 10_000_000)
    with pytest.raises(ValueError):
        t.snapshot(snapshot_id=1, as_of_timestamp_ms=ts_v2)


def test_expire_keeps_recent_snapshot_jsons_under_grace(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, _rows(2)))
    t.append(_df(spark, _rows(2, base_day=9)))
    # default grace: just-written snapshot JSONs survive so a concurrent
    # time-traveling reader cannot hit FileNotFoundError
    t.expire_snapshots(keep_last=1)
    assert len(t.history()) == 3
    t.expire_snapshots(keep_last=1, grace_seconds=0)
    assert len(t.history()) == 1


# -------------------------------------------------------------- SQL surface
def test_catalog_register_views_spark_sql(spark, warehouse):
    cat = Catalog(spark, warehouse)
    t = cat.create_table("bronze.msgs", SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(20)))
    views = cat.register_views()
    assert "bronze.msgs" in views
    got = spark.sql("SELECT k, v, ts FROM bronze.msgs WHERE v >= 10")
    assert got.count() == 10
    assert {r.k for r in spark.sql("SELECT k FROM bronze.msgs").collect()} == {
        r.k for r in t.read().collect()
    }
    # views pin the registration-time snapshot; refresh picks up new commits
    t.append(_df(spark, _rows(5, base_day=9)))
    assert spark.sql("SELECT count(*) AS n FROM bronze.msgs").collect()[0].n == 20
    cat.register_views()
    assert spark.sql("SELECT count(*) AS n FROM bronze.msgs").collect()[0].n == 25


def test_to_view_time_travel_and_tombstones(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(4)))
    v2 = t.snapshot_id
    src = spark.createDataFrame(
        [("k0000", 99, datetime.datetime(2026, 2, 1), 100, "u"),
         ("k0001", None, None, 101, "d")],
        "k string, v int, ts timestamp_ntz, lsn long, op string",
    )
    t.merge_cdc(src, key_cols=["k"], lsn_col="lsn", op_col="op")
    ident = t.to_view("tt.cur")
    old = t.to_view("tt.old", snapshot_id=v2)
    cur_rows = {(r.k, r.v) for r in spark.sql(f"SELECT k, v FROM {ident}").collect()}
    # tombstoned k0001 is filtered out of the view; k0000 shows merged value
    assert ("k0000", 99) in cur_rows
    assert all(k != "k0001" for k, _ in cur_rows)
    assert len(cur_rows) == 3
    assert spark.sql(f"SELECT count(*) AS n FROM {old}").collect()[0].n == 4


def test_live_view_auto_refreshes_on_commit(spark, warehouse):
    """A view registered without a pinned snapshot follows THIS handle's
    commits — append, update, delete — with no manual re-register."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(10)))
    ident = t.to_view("live.msgs")
    n = lambda: spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n
    assert n() == 10
    t.append(_df(spark, _rows(5, base_day=9)))
    assert n() == 15, "live view must pick up the append without re-register"
    t.delete(F.col("v") < 3)  # v<3 matches 3 rows in EACH of the two waves
    assert n() == 9
    # a PINNED view must stay pinned through later commits
    pinned_sid = t.snapshot_id
    pinned = t.to_view("live.pinned", snapshot_id=pinned_sid)
    t.append(_df(spark, _rows(4, base_day=11)))
    assert n() == 13
    assert spark.sql(f"SELECT count(*) AS n FROM {pinned}").collect()[0].n == 9


def test_pinned_reregister_of_live_name_stays_pinned(spark, warehouse):
    """Re-registering a LIVE view name with a snapshot pin must DEMOTE it
    from the auto-refresh set — otherwise the next commit silently re-points
    the pinned time-travel view at latest."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(6)))
    ident = t.to_view("pin.v")                    # live
    pinned_sid = t.snapshot_id
    t.to_view("pin.v", snapshot_id=pinned_sid)    # SAME name, now pinned
    t.append(_df(spark, _rows(4, base_day=9)))
    n = spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n
    assert n == 6, "pinned-over-live view was resurrected to latest by commit"


def test_drop_view_is_not_resurrected_by_commit(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(4)))
    ident = t.to_view("gone.v")
    assert spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n == 4
    t.drop_view("gone.v")
    t.append(_df(spark, _rows(2, base_day=9)))  # auto-refresh must NOT recreate
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|not found|cannot be found"):
        spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()


def test_view_status_detects_cross_handle_staleness(spark, warehouse):
    """Any session-catalog reader can ask whether a to_view view is current:
    the pinned snapshot id is stamped as a view property and compared
    against the table's latest snapshot (metadata-only)."""
    path = os.path.join(warehouse, "t")
    a = LakeTable.create(spark, path, SCHEMA, bucket_by="k", bucket_count=2)
    a.append(_df(spark, _rows(5)))
    a.to_view("st.v")
    s = LakeTable.view_status(spark, "st.v")
    assert s["current"] and s["pinned_snapshot_id"] == a.snapshot_id
    # a SECOND handle (stand-in for another process) commits
    b = LakeTable.load(spark, path)
    b.append(_df(spark, _rows(3, base_day=9)))
    s = LakeTable.view_status(spark, "st.v")
    assert not s["current"]
    assert s["latest_snapshot_id"] == b.snapshot_id > s["pinned_snapshot_id"]
    # re-registering brings it current again
    a.to_view("st.v")
    assert LakeTable.view_status(spark, "st.v")["current"]


def test_catalog_refresh_views_repoints_only_moved_tables(spark, warehouse):
    cat = Catalog(spark, warehouse)
    t1 = cat.create_table("ns.one", SCHEMA, bucket_by="k", bucket_count=2)
    t2 = cat.create_table("ns.two", SCHEMA, bucket_by="k", bucket_count=2)
    t1.append(_df(spark, _rows(4)))
    t2.append(_df(spark, _rows(6)))
    cat.register_views()
    # cross-handle commit to ONE table only
    other = LakeTable.load(spark, cat.resolve("ns.one"))
    other.append(_df(spark, _rows(2, base_day=9)))
    refreshed = cat.refresh_views()
    assert set(refreshed) == {"ns.one"}, refreshed
    assert spark.sql("SELECT count(*) AS n FROM ns.one").collect()[0].n == 6
    assert spark.sql("SELECT count(*) AS n FROM ns.two").collect()[0].n == 6
    # nothing moved since → pure metadata no-op
    assert cat.refresh_views() == {}


def test_catalog_drop_drops_registered_view(spark, warehouse):
    cat = Catalog(spark, warehouse)
    t = cat.create_table("dz.t", SCHEMA)
    t.append(_df(spark, _rows(3)))
    cat.register_views()
    assert spark.sql("SELECT count(*) AS n FROM dz.t").collect()[0].n == 3
    # drop through a SECOND catalog instance (stand-in for another process'
    # handle): the decision comes from the view's stamped lake.path, not
    # this object's in-memory pins
    cat2 = Catalog(spark, warehouse)
    cat2.drop("dz.t")
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|not found|cannot be found"):
        spark.sql("SELECT count(*) AS n FROM dz.t").collect()


def test_view_status_current_after_metadata_only_commit(spark, warehouse):
    """A commit whose manifest map is unchanged (fence/properties-only)
    skips view-text regeneration — but must still advance the freshness
    stamp, or view_status reports the view stale forever."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(6)))
    t.to_view("fs.v")
    snap = t.snapshot()
    nxt = t._next_snap(snap, "noop", dict(snap["manifests"]), {}, "fence-1")
    t._commit(nxt)
    st = LakeTable.view_status(spark, "fs.v")
    assert st["current"], st


def test_view_text_is_o_directories_not_o_files(spark, warehouse):
    """Many files per bucket must collapse to per-directory glob members:
    the view text length tracks data DIRECTORIES (buckets × commits), not
    files, and never embeds individual part-file names for clean dirs."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(64)))
    t.compact(sort_by=["ts"], target_files_per_bucket=8)  # 2 buckets × ~8 files
    assert len(t.files()) > 4
    sql = t.as_sql()
    assert "part-" not in sql, "view text still enumerates part files"
    assert "/*.parquet" in sql
    got = spark.sql(sql)
    assert got.count() == 64
    # correctness through a row-op that orphans on-disk files: the dirs
    # stop being fully referenced, the text falls back for them, results
    # stay exact
    t.delete(F.col("v") < 10)
    assert spark.sql(t.as_sql()).count() == 54


def test_as_sql_one_scan_per_schema_group(spark, warehouse):
    """View text holds ONE multi-path scan per schema group (brace glob),
    not one UNION ALL branch per file — and still reads correctly across an
    evolved schema boundary."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(8)))
    t.append(_df(spark, _rows(4, base_day=9)))  # same schema, more files
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("w", T.IntegerType())])
    t.append(spark.createDataFrame(
        [("x1", 1, datetime.datetime(2026, 3, 1), 7)], wide))
    sql = t.as_sql()
    n_files = len(t.files())
    assert n_files > 2
    # exactly 2 schema groups → at most 1 UNION ALL in the text
    assert sql.count("UNION ALL") == 1
    # the multi-file group collapses to ONE brace-glob scan + its
    # completeness guard (which re-references the same glob)
    assert "{" in sql and "assert_true" in sql
    got = spark.sql(sql)
    assert got.count() == 13
    assert got.filter(F.col("w").isNotNull()).count() == 1


def test_view_missing_file_fails_loudly_not_partially(spark, warehouse):
    """A multi-file glob silently matches a SUBSET when a pinned file
    disappears — the completeness guard must turn that into a loud error
    (silent partial results are the one unacceptable outcome)."""
    import glob as _glob

    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(8)))
    ident = t.to_view("guard.msgs")
    assert spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n == 8
    victim = sorted(_glob.glob(
        os.path.join(warehouse, "t", "data", "**", "*.parquet"), recursive=True
    ))[0]
    os.remove(victim)
    with pytest.raises(Exception, match="stale|assert|exist"):
        spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()


def test_ntz_stats_out_of_range_year_never_prunes_unsoundly(spark, warehouse):
    """Spark renders NTZ year 10000 as '+10000-…' which would sort BELOW
    '2026-…' in the fixed-width encoding — such bounds must become NULL
    (unbounded), so the file still matches normal-year predicates."""
    import datetime as dt

    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=1)
    # Python datetime caps at year 9999 — build the out-of-range wall clock
    # JVM-side (Spark NTZ reaches year ~294k)
    far = spark.sql(
        "SELECT 'far' AS k, 1 AS v, "
        "TIMESTAMP_NTZ '10000-01-01 00:00:00' AS ts"
    )
    t.append(far.select(
        F.col("k").cast("string"), F.col("v").cast("int"), F.col("ts")))
    fe = t.files()[0]
    # both bounds NULL → the writer drops the column from stats entirely
    # (no stats = the pruner can never skip this file on ts)
    assert fe.stats is None or "ts" not in fe.stats, fe.stats
    got = t.read(where=[("ts", ">=", dt.datetime(2026, 1, 1))])
    assert got.count() == 1  # never skipped
    _scanned, skipped = t.plan_files(where=[("ts", ">=", dt.datetime(2026, 1, 1))])
    assert skipped == []


def test_stats_v1_ntz_bounds_never_prune(spark, warehouse):
    """Bounds written by the pre-fix (v1) encoder are byte-indistinguishable
    from sound v2 bounds; the version marker must force NTZ predicates to
    fall back to the residual filter on v1 stats."""
    from cdm_data_loader_utils_spark.lake.table import _file_skippable

    types = {"ts": T.TimestampNTZType()}
    import datetime as dt
    pred = [("ts", ">=", dt.datetime(2026, 6, 1))]
    v1 = {"ts": ["2026-01-01 00:00:00.000000", "2026-02-01 00:00:00.000000"]}
    v2 = dict(v1, __v=2)
    assert _file_skippable(v2, pred, types, "UTC") is True
    assert _file_skippable(v1, pred, types, "UTC") is False


def test_zorder_multi_dim_pruning(spark, warehouse):
    """Linear sort_by=["ts"] prunes only ts ranges; zorder_by=["ts","v"]
    (interleaved-bit clustering) must prune file-level on BOTH dimensions,
    with identical query results."""
    import datetime as dt

    N = 4096
    rows = [
        (f"k{i % 7}", (i * 2654435761) % 100000,  # v scrambled vs ts order
         dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i))
        for i in range(N)
    ]
    vr = [("v", ">=", 90000)]          # top-10% band of v
    tr = [("ts", ">=", dt.datetime(2026, 1, 1) + dt.timedelta(seconds=int(N * 0.9)))]

    lin = LakeTable.create(spark, os.path.join(warehouse, "lin"), SCHEMA,
                           bucket_by="k", bucket_count=1)
    lin.append(_df(spark, rows))
    lin.compact(sort_by=["ts"], target_files_per_bucket=16)
    _, lin_v_skip = lin.plan_files(where=vr)
    assert lin_v_skip == [], "v is uncorrelated with ts — linear sort cannot prune it"

    zo = LakeTable.create(spark, os.path.join(warehouse, "zo"), SCHEMA,
                          bucket_by="k", bucket_count=1)
    zo.append(_df(spark, rows))
    zo.compact(zorder_by=["ts", "v"], target_files_per_bucket=16)
    _, zo_v_skip = zo.plan_files(where=vr)
    _, zo_t_skip = zo.plan_files(where=tr)
    assert len(zo_v_skip) > 0, "z-order must prune on the second dimension"
    assert len(zo_t_skip) > 0, "z-order must still prune on ts"
    # results identical to the unclustered truth regardless of layout
    want = {(r.k, r.v) for r in lin.read(where=vr).collect()}
    got = {(r.k, r.v) for r in zo.read(where=vr).collect()}
    assert got == want and len(got) == sum(1 for _, v, _ in rows if v >= 90000)
    # bounds persist: a LATER append keeps the clustering without resampling
    props = zo.snapshot().get("properties")
    assert props["write.zorder.by"] == ["ts", "v"]
    assert len(props["write.zorder.bounds"]["v"]) > 100
    zo.append(_df(spark, rows[:256]))
    _, skip2 = zo.plan_files(where=vr)
    assert len(skip2) >= len(zo_v_skip), "appended files must stay clustered"


def test_zorder_degenerate_bounds_rejected(spark, warehouse):
    """An all-NULL column yields zero quantile cut points — persisting them
    would silently collapse that dimension's clustering to bin 0; compact
    must refuse loudly instead."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(spark.createDataFrame(
        [(f"k{i}", None, datetime.datetime(2026, 1, 1, 0, 0, i))
         for i in range(8)],
        SCHEMA,
    ))
    with pytest.raises(ValueError, match="cut points"):
        t.compact(zorder_by=["v"])
    # the multi-column form names only the offending column
    with pytest.raises(ValueError, match=r"\['v'\]"):
        t.compact(zorder_by=["ts", "v"])


def test_zorder_bounds_drift_warns_on_recompact(spark, warehouse):
    """Appends between compacts reuse the persisted quantile bounds; when
    the distribution shifts wholesale, re-compacting must WARN that the
    interim files were weakly clustered (and refresh the bounds)."""
    import warnings as _w

    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=1)
    t.append(_df(spark, [
        (f"k{i}", i, datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=i))
        for i in range(512)
    ]))
    t.compact(zorder_by=["v"], target_files_per_bucket=4)
    old_bounds = t.snapshot()["properties"]["write.zorder.bounds"]["v"]
    # drifted append: every v far above the old quantile range
    t.append(_df(spark, [
        (f"d{i}", 10_000_000 + i,
         datetime.datetime(2026, 2, 1) + datetime.timedelta(seconds=i))
        for i in range(512)
    ]))
    with _w.catch_warnings(record=True) as w:
        _w.simplefilter("always")
        t.compact(zorder_by=["v"], target_files_per_bucket=4)
    assert any("drift" in str(x.message) for x in w), [str(x.message) for x in w]
    assert t.snapshot()["properties"]["write.zorder.bounds"]["v"] != old_bounds
    # same-distribution recompact stays silent
    with _w.catch_warnings(record=True) as w2:
        _w.simplefilter("always")
        t.compact(zorder_by=["v"], target_files_per_bucket=4)
    assert not any("drift" in str(x.message) for x in w2)


def test_zorder_rejects_string_and_unknown_columns(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, _rows(4)))
    with pytest.raises(ValueError, match="range locality|unsupported"):
        t.compact(zorder_by=["k"])
    with pytest.raises(ValueError, match="not in table schema"):
        t.compact(zorder_by=["nope"])
    with pytest.raises(ValueError, match="not both"):
        t.compact(sort_by=["v"], zorder_by=["v"])


def test_view_of_empty_table(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    ident = t.to_view("tt.empty")
    df = spark.sql(f"SELECT * FROM {ident}")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v", "ts"]


# ------------------------------------------------------ catalog + fs hardening
def test_catalog_register_conflict(spark, warehouse):
    cat = Catalog(spark, warehouse)
    p1 = cat.register("a.t")
    assert cat.register("a.t") == p1  # idempotent
    other = os.path.join(warehouse, "elsewhere")
    with pytest.raises(ValueError, match="already maps"):
        cat.register("a.t", other)
    assert cat.resolve("a.t") == p1
    assert cat.register("a.t", other, overwrite=True) == other
    assert cat.resolve("a.t") == other


def test_already_exists_classification_is_class_based():
    class FakeJavaClass:
        def __init__(self, name):
            self._n = name

        def getName(self):
            return self._n

    class FakeJE:
        def __init__(self, name, cause=None):
            self._name, self._cause = name, cause

        def getClass(self):
            return FakeJavaClass(self._name)

        def getCause(self):
            return self._cause

    class FakePy4J(Exception):
        def __init__(self, msg, je=None):
            super().__init__(msg)
            self.java_exception = je

    # real conflict: FileAlreadyExistsException (direct or as cause)
    assert _is_already_exists(
        FakePy4J("boom", FakeJE("org.apache.hadoop.fs.FileAlreadyExistsException"))
    )
    assert _is_already_exists(
        FakePy4J("boom", FakeJE(
            "java.io.IOException",
            FakeJE("org.apache.hadoop.fs.FileAlreadyExistsException"),
        ))
    )
    # HDFS RemoteException form: class name only in the message text
    assert _is_already_exists(
        FakePy4J("org.apache.hadoop.fs.FileAlreadyExistsException: /p exists")
    )
    # infrastructure failures mentioning 'exist' must NOT be misclassified
    assert not _is_already_exists(
        FakePy4J("Parent path does not exist: /warehouse/t/_log")
    )
    assert not _is_already_exists(
        FakePy4J("lease on existing file", FakeJE("java.io.IOException"))
    )


def test_file_lock_provider_mutual_exclusion(spark, warehouse):
    """Locked commit path: with a lock provider, exclusivity comes from
    lock + exists-check + plain write — the multi-writer recipe for stores
    without atomic create-if-absent (plain S3)."""
    from concurrent.futures import ThreadPoolExecutor

    from cdm_data_loader_utils_spark.lake.fs import (
        FileLockProvider,
        HadoopFilesystem,
        LocalFilesystem,
    )

    lfs = LocalFilesystem()
    lock = FileLockProvider(lfs, os.path.join(warehouse, "_locks"))
    hfs = HadoopFilesystem(spark, f"file://{warehouse}", lock_provider=lock)
    target = f"file://{warehouse}/committed.json"

    def attempt(i):
        try:
            hfs.write_text_exclusive(target, f'{{"writer": {i}}}')
            return i
        except FileExistsError:
            return None

    with ThreadPoolExecutor(max_workers=4) as pool:
        winners = [w for w in pool.map(attempt, range(4)) if w is not None]
    assert len(winners) == 1
    assert hfs.read_text(target) == f'{{"writer": {winners[0]}}}'
    # no lock files leak
    assert lfs.list_names(os.path.join(warehouse, "_locks")) == []


def test_file_lock_provider_ttl_reclaims_stale_lock(warehouse):
    from cdm_data_loader_utils_spark.lake.fs import FileLockProvider, LocalFilesystem

    lfs = LocalFilesystem()
    lock = FileLockProvider(lfs, os.path.join(warehouse, "_locks"),
                            ttl_seconds=0.2)
    t1 = lock.acquire("snap-v5")
    assert os.path.exists(t1["path"])
    time.sleep(0.3)  # holder "crashed"; lock is past TTL
    t2 = lock.acquire("snap-v5", timeout=5.0)
    assert os.path.exists(t2["path"])
    # the outlived original holder must NOT delete the reclaimer's lock
    lock.release(t1)
    assert os.path.exists(t2["path"])
    lock.release(t2)
    assert not os.path.exists(t2["path"])


def test_lake_table_multi_writer_with_lock_provider(spark, warehouse):
    """End-to-end: two appends racing through a locked Hadoop fs both land
    (optimistic retry), final table holds both rows."""
    from cdm_data_loader_utils_spark.lake.fs import (
        FileLockProvider,
        HadoopFilesystem,
        LocalFilesystem,
    )

    lock = FileLockProvider(LocalFilesystem(), os.path.join(warehouse, "_locks"))
    uri = f"file://{warehouse}/t"
    fs = HadoopFilesystem(spark, uri, lock_provider=lock)
    t = LakeTable.create(spark, uri, SCHEMA, fs=fs)
    from concurrent.futures import ThreadPoolExecutor

    def write(i):
        LakeTable.load(spark, uri, fs=fs).append(
            _df(spark, [(f"w{i}", i, datetime.datetime(2026, 1, 1))])
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(write, [1, 2]))
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {("w1", 1), ("w2", 2)}


def test_compact_buckets_is_incremental(spark, warehouse):
    """Per-bucket compaction rewrites ONLY buckets with accumulated small
    files; untouched buckets carry forward by manifest reference."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=4)
    for i in range(4):
        t.append(_df(spark, _rows(20, base_day=i + 1)))
    before = t.snapshot()
    files_per_bucket = {
        key: len(t._read_manifest(m)) for key, m in before["manifests"].items()
    }
    assert any(n >= 2 for n in files_per_bucket.values())
    rows_before = {(r.k, r.v, r.ts) for r in t.read().collect()}

    sid = t.compact_buckets(min_files=2)
    assert sid == t.snapshot_id
    after = t.snapshot()
    assert after["operation"] == "compact"
    # compacted buckets now hold 1 file; any bucket that was already at 1
    # file keeps its EXACT manifest reference (no rewrite)
    for key, m in after["manifests"].items():
        n_before = files_per_bucket.get(key, 0)
        if n_before >= 2:
            assert len(t._read_manifest(m)) == 1
        else:
            assert m == before["manifests"][key]
    assert {(r.k, r.v, r.ts) for r in t.read().collect()} == rows_before
    # idempotent: nothing left to compact -> no new snapshot
    assert t.compact_buckets(min_files=2) == sid


def test_compact_buckets_purges_tombstones(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(10)))
    src = spark.createDataFrame(
        [("k0001", None, None, 100, "d"), ("k0002", None, None, 101, "d")],
        "k string, v int, ts timestamp_ntz, lsn long, op string",
    )
    t.merge_cdc(src, key_cols=["k"], lsn_col="lsn", op_col="op")
    assert t.read().count() == 8
    meta = t.read(include_meta=True)
    assert meta.count() == 10  # tombstones physically present
    t.compact_buckets(bucket_keys=None, min_files=1,
                      purge_tombstones_below_lsn=1000)
    assert t.read().count() == 8
    assert t.read(include_meta=True).count() == 8  # tombstones purged


def test_expire_grace_retained_snapshots_keep_their_files(spark, warehouse):
    """A snapshot JSON retained by the grace period must keep its data files
    readable: the live set includes every snapshot that stays LISTED, not
    just keep_last (otherwise a listed, in-grace old snapshot loses its
    files mid-read)."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, _rows(4)))
    v2 = t.snapshot_id
    t.overwrite(_df(spark, _rows(2, base_day=9)))
    # age the DATA files past any grace, but leave snapshot JSONs fresh
    old = time.time() - 7200
    for root, _dirs, files in os.walk(os.path.join(warehouse, "t", "data")):
        for fn in files:
            os.utime(os.path.join(root, fn), (old, old))
    for fn in os.listdir(os.path.join(warehouse, "t", "_log", "manifests")):
        os.utime(os.path.join(warehouse, "t", "_log", "manifests", fn), (old, old))
    t.expire_snapshots(keep_last=1, grace_seconds=600)
    # v2's JSON is within grace → still listed → its files must survive
    assert v2 in [s["snapshot_id"] for s in t.history()]
    assert t.read(snapshot_id=v2).count() == 4
    # once the JSONs are also past grace, everything is reclaimed
    for fn in os.listdir(os.path.join(warehouse, "t", "_log")):
        p = os.path.join(warehouse, "t", "_log", fn)
        if os.path.isfile(p):
            os.utime(p, (old, old))
    t.expire_snapshots(keep_last=1, grace_seconds=600)
    assert [s["snapshot_id"] for s in t.history()] == [t.snapshot_id]
    assert t.read().count() == 2


def test_compact_sort_by_unknown_column_raises(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(5)))
    with pytest.raises(ValueError, match="sort_by"):
        t.compact(sort_by=["tss"])  # typo for ts
    assert "write.sort_by" not in t.snapshot()["properties"]


def test_stats_columns_unsupported_type_warns(spark, warehouse):
    import warnings as _w

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("arr", T.ArrayType(T.IntegerType())),
    ])
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), schema,
                         properties={"stats.columns": ["arr"]})
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        t.append(spark.createDataFrame([("a", [1, 2])], schema).coalesce(1))
    assert any("arr" in str(w.message) for w in caught)


def test_encode_pred_value_timezone_semantics():
    import datetime as dt

    utc = dt.timezone.utc
    # instant column: aware literal → true epoch; naive literal → session tz
    aware = dt.datetime(2026, 1, 1, 3, 0, tzinfo=utc)
    assert _encode_pred_value(aware, T.TimestampType(), "America/New_York") \
        == int(aware.timestamp() * 1_000_000)
    # naive literal on an instant column: PySpark converts it via the
    # DRIVER's OS timezone (machine-dependent) — the pruner must refuse
    naive = dt.datetime(2026, 1, 1, 3, 0)
    assert _encode_pred_value(naive, T.TimestampType(), "America/New_York") is None
    assert _encode_pred_value(naive, T.TimestampType(), "UTC") is None
    # wall-clock column: aware literal is ambiguous → refuse to prune
    assert _encode_pred_value(aware, T.TimestampNTZType(), "UTC") is None
    # years < 1000: %Y does not zero-pad on this platform; the encoder must
    # (an unpadded '999-…' sorts ABOVE every padded bound → unsound skip)
    import datetime as _dt
    early = _encode_pred_value(
        _dt.datetime(999, 12, 31, 23, 59, 59), T.TimestampNTZType(), "UTC")
    assert early == "0999-12-31 23:59:59.000000", early
    assert early < "2026-01-01 00:00:00.000000"
    assert _encode_pred_value(naive, T.TimestampNTZType(), "UTC") \
        == "2026-01-01 03:00:00.000000"
    assert _encode_pred_value(dt.date(2026, 1, 2), T.DateType(), None) \
        == (dt.date(2026, 1, 2) - dt.date(1970, 1, 1)).days


def test_file_skippable_never_skips_a_matching_row_property():
    """Soundness property (hypothesis): if the pruner says SKIP, no row in
    the file can satisfy the conjunctive predicate. Completeness is not
    required (conservative keeps are fine); skipping a matching row is the
    one unforgivable failure mode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ops = st.sampled_from(["=", "!=", "<", "<=", ">", ">=", "in"])
    values = st.integers(min_value=-50, max_value=50)

    def satisfies(col_val, op, v):
        if col_val is None:
            return False  # SQL three-valued logic: NULL never matches these ops
        if op == "=":
            return col_val == v
        if op == "!=":
            return col_val != v
        if op == "<":
            return col_val < v
        if op == "<=":
            return col_val <= v
        if op == ">":
            return col_val > v
        if op == ">=":
            return col_val >= v
        return col_val in v

    @given(
        rows=st.lists(st.one_of(st.none(), values), min_size=1, max_size=8),
        preds=st.lists(
            st.tuples(
                ops,
                st.one_of(values, st.lists(values, max_size=4)),
            ),
            min_size=1,
            max_size=3,
        ),
    )
    @settings(max_examples=400, deadline=None)
    def check(rows, preds):
        where = []
        for op, v in preds:
            if op == "in" and not isinstance(v, list):
                v = [v]
            if op != "in" and isinstance(v, list):
                op = "in"
            where.append(("c", op, v))
        present = [r for r in rows if r is not None]
        stats = {"c": [min(present), max(present)]} if present else {}
        if _file_skippable(stats or None, where):
            for r in rows:
                assert not all(
                    satisfies(r, op, v) for _c, op, v in where
                ), (rows, where)

    check()


def test_corrupt_lock_file_times_out_and_reclaims(warehouse):
    """A corrupt/partially-written lock must neither hang acquire() nor
    block it forever: within TTL it times out cleanly; past TTL it is
    reclaimed like any stale lock."""
    from cdm_data_loader_utils_spark.lake.fs import FileLockProvider, LocalFilesystem

    lfs = LocalFilesystem()
    lock = FileLockProvider(lfs, os.path.join(warehouse, "_locks"),
                            ttl_seconds=60.0)
    path = lock._path("t")
    with open(path, "w") as f:
        f.write("{not json")  # crashed holder, partial write
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        lock.acquire("t", timeout=0.5)
    assert time.monotonic() - t0 < 5.0  # bounded, no busy-hang
    # past TTL the corrupt lock is reclaimable
    lock2 = FileLockProvider(lfs, os.path.join(warehouse, "_locks"),
                             ttl_seconds=0.05)
    time.sleep(0.1)
    tok = lock2.acquire("t", timeout=5.0)
    lock2.release(tok)


def test_encode_pred_value_pre_1970_is_exact():
    import datetime as dt

    utc = dt.timezone.utc
    epoch = dt.datetime(1970, 1, 1, tzinfo=utc)
    for v in [
        dt.datetime(1955, 3, 1, 12, 0, 0, 123457, tzinfo=utc),
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=utc),
        dt.datetime(2250, 6, 1, 0, 0, 0, 1, tzinfo=utc),
    ]:
        exact = (v - epoch) // dt.timedelta(microseconds=1)
        assert _encode_pred_value(v, T.TimestampType(), "UTC") == exact


def test_file_skippable_cross_type_literal_keeps_not_crashes():
    stats = {"v": [10, 20]}
    # string literal against int stats: residual filter handles the cast;
    # the pruner must conservatively keep, never raise
    assert not _file_skippable(stats, [("v", "=", "5")])
    assert not _file_skippable(stats, [("v", "<", "x")])
    assert not _file_skippable(stats, [("v", "in", ["5", 30])])


def test_write_table_concurrent_first_write_race(spark, warehouse):
    from concurrent.futures import ThreadPoolExecutor

    from cdm_data_loader_utils_spark.lake.table import write_table

    path = os.path.join(warehouse, "fresh")

    def write(i):
        return write_table(
            spark, path,
            _df(spark, [(f"w{i}", i, datetime.datetime(2026, 1, 1))]),
            mode="append",
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(write, [1, 2]))
    got = {(r.k, r.v) for r in LakeTable.load(spark, path).read().collect()}
    assert got == {("w1", 1), ("w2", 2)}


def test_fence_horizon_bounds_snapshot_metadata(spark, warehouse):
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         properties={"fence.max_entries": 3})
    for i in range(5):
        t.append(_df(spark, [(f"k{i}", i, datetime.datetime(2026, 1, 1))]),
                 fence_key=f"run:{i}")
    fences = t.snapshot()["fences"]
    assert len(fences) == 3
    # newest fences retained, oldest evicted past the horizon
    assert t.is_fenced("run:4") is not None
    assert t.is_fenced("run:0") is None
    assert t.read().count() == 5


def test_merge_exclude_cols_opt_out(spark, warehouse):
    """A business payload legitimately named batch_id survives the merge
    when the transport-column exclusion is opted out."""
    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("batch_id", T.LongType()),
    ])
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), schema,
                         bucket_by="k", bucket_count=2)
    src = spark.createDataFrame(
        [("a", 7, 1, "i")], "k string, batch_id long, lsn long, op string"
    )
    t.merge_cdc(src, key_cols=["k"], lsn_col="lsn", op_col="op",
                exclude_cols=())
    assert [(r.k, r.batch_id) for r in t.read().collect()] == [("a", 7)]


def test_stats_pruning_correct_under_non_utc_session_tz(spark, warehouse):
    """Instant (TimestampType) stats are encoded as true epoch micros
    JVM-side, so pruning stays sound when the session timezone is not UTC —
    both for tz-aware predicates and naive ones (interpreted in session tz,
    exactly like the residual filter)."""
    import datetime as dt

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        schema = T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ])
        t = LakeTable.create(spark, os.path.join(warehouse, "t"), schema,
                             bucket_by="k", bucket_count=1)
        utc = dt.timezone.utc
        rows = [
            (f"k{i}", dt.datetime(2026, 1, 1, h, 0, tzinfo=utc))
            for i, h in enumerate(range(0, 24, 2))
        ]
        t.append(spark.createDataFrame(rows, schema))
        t.compact(sort_by=["ts"], target_files_per_bucket=4)

        aware_cut = dt.datetime(2026, 1, 1, 12, 0, tzinfo=utc)
        got = t.read(where=[("ts", ">=", aware_cut)])
        want = t.read().filter(F.col("ts") >= F.lit(aware_cut))
        assert got.count() == want.count() == 6
        scanned, skipped = t.plan_files(where=[("ts", ">=", aware_cut)])
        assert skipped, "no files pruned under non-UTC session tz"
        # a NAIVE literal against an instant column is machine-dependent
        # (PySpark converts via the driver's OS tz, not the session tz):
        # the pruner must refuse to prune but the read must stay CORRECT
        naive_cut = dt.datetime(2026, 1, 1, 7, 0)
        got_n = t.read(where=[("ts", ">=", naive_cut)])
        want_n = t.read().filter(F.col("ts") >= F.lit(naive_cut))
        assert got_n.count() == want_n.count()
        _scanned_n, skipped_n = t.plan_files(where=[("ts", ">=", naive_cut)])
        assert skipped_n == [], "naive instant literal must not prune"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_ntz_stats_prune_sound_in_dst_gap_non_utc_tz(spark, warehouse):
    """NTZ (wall-clock) bounds must be encoded on a tz-FREE path: under a
    non-UTC session tz, a wall-clock value inside the DST spring-forward gap
    (02:30 on 2026-03-08 does not exist in America/New_York) would shift by
    an hour through any session-tz cast — date_format's analyzer-inserted
    NTZ→TIMESTAMP cast did exactly that. The fixed-width CAST-to-string
    encoding keeps the stored fields verbatim, so boundary pruning on a
    naive literal stays exact."""
    import datetime as dt

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        schema = T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampNTZType()),
        ])
        t = LakeTable.create(spark, os.path.join(warehouse, "t"), schema,
                             bucket_by="k", bucket_count=1)
        # wall-clock values straddling the 02:00–03:00 spring-forward gap,
        # with sub-second precision to exercise the fraction padding
        rows = [
            (f"k{i}", dt.datetime(2026, 3, 8, 1, 0) + i * dt.timedelta(minutes=15, milliseconds=250))
            for i in range(16)
        ]
        t.append(spark.createDataFrame(rows, schema))
        t.compact(sort_by=["ts"], target_files_per_bucket=4)

        cut = dt.datetime(2026, 3, 8, 2, 30)  # inside the local DST gap
        got = t.read(where=[("ts", ">=", cut)])
        # ground truth computed wall-clock in Python: a naive F.lit against
        # an NTZ column is exactly the session-tz-mediated comparison the
        # typed residual filter exists to avoid, so it can't be the oracle
        want_n = sum(1 for _, ts in rows if ts >= cut)
        assert got.count() == want_n > 0
        _scanned, skipped = t.plan_files(where=[("ts", ">=", cut)])
        assert skipped, "no files pruned on NTZ bounds in DST gap"
        # equality probe at an exact stored wall-clock with fraction
        probe = rows[9][1]
        got_eq = t.read(where=[("ts", "=", probe)])
        assert got_eq.count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_bloom_filter_property_written_and_readable(spark, warehouse):
    """write.bloom.columns plumbs parquet bloom filters into every data
    file; verified via the parquet footer (bloom offset present), not just
    a smoke read."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2,
                         properties={"write.bloom.columns": ["k"]})
    t.append(_df(spark, _rows(50)))
    assert t.read().count() == 50
    # footer check: thrift-encoded bloom offset lives in the column metadata
    import glob

    files = glob.glob(os.path.join(warehouse, "t", "data", "**", "*.parquet"),
                      recursive=True)
    assert files
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(files[0]).metadata
        col = next(
            md.row_group(0).column(i)
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "k"
        )
        if hasattr(col, "bloom_filter_offset"):
            assert col.bloom_filter_offset is not None
    except StopIteration:
        pass  # k became the partition col layout; plumbing still verified


def test_update_with_where_hint_prunes_probe(spark, warehouse):
    """The where hint narrows the UPDATE's probe to stats-matching files;
    results equal the unhinted update."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=1)
    t.append(_df(spark, _rows(120)))
    t.compact(sort_by=["v"], target_files_per_bucket=4)
    n_files = len(t.files())
    assert n_files > 1
    _sid, updated = t.update(
        F.col("v") >= 100, {"k": F.lit("hot")},
        where=[("v", ">=", 100)],
    )
    assert updated == 20
    assert t.snapshot()["summary"]["files_rewritten"] < n_files
    got = {(r.v, r.k) for r in t.read().filter(F.col("v") >= 100).collect()}
    assert got == {(v, "hot") for v in range(100, 120)}
    assert t.read().count() == 120


def test_unbucketed_clustered_compact_keeps_many_files(spark, warehouse):
    """compact(sort_by=...) on an UNBUCKETED table must not collapse to a
    single file (that would destroy per-file min/max pruning, the point of
    clustering); the default width follows session parallelism, and plain
    unclustered compact honors the explicit file target for consolidation."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA)
    t.append(_df(spark, _rows(2048)))
    t.compact(sort_by=["v"])
    n = len(t.files())
    assert n > 1, "clustered compact collapsed an unbucketed table to 1 file"
    _, skipped = t.plan_files(where=[("v", ">=", 2000)])
    assert skipped, "clustered unbucketed files must prune on the sort key"
    # explicit target still consolidates
    t2 = LakeTable.create(spark, os.path.join(warehouse, "t2"), SCHEMA)
    for w in range(3):
        t2.append(_df(spark, _rows(4, base_day=w + 1)).coalesce(1))
    t2.compact(target_files_per_bucket=1)
    assert len(t2.files()) == 1


# ------------------------------------------------------------------- tags
def test_snapshot_tags_pin_reads_and_survive_expire(spark, warehouse):
    """Iceberg-refs parity: tag(name) makes a snapshot addressable by name
    AND retention-protected — expire_snapshots never reclaims a tagged
    snapshot's JSON or files, so read(tag=...) reproduces the exact state
    however old; drop_tag releases it back to normal retention."""
    t = LakeTable.create(spark, os.path.join(warehouse, "t"), SCHEMA,
                         bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(5)))
    t.tag("v1")
    v1_sid = t.snapshot_id
    t.delete(F.col("v") < 2)
    t.append(_df(spark, _rows(4, base_day=9)))
    assert t.tags() == {"v1": v1_sid}
    assert t.read(tag="v1").count() == 5
    # aggressive expire: everything untagged except latest goes
    t.expire_snapshots(keep_last=1, grace_seconds=0)
    assert t.read(tag="v1").count() == 5, "tagged snapshot lost files to expire"
    assert v1_sid in t._versions()
    # views can pin by tag; the underlying files are expire-protected
    ident = t.to_view("tags.v1", tag="v1")
    assert spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n == 5
    # conflict rules mirror the catalog: idempotent re-tag, loud re-point
    assert t.tag("v1", v1_sid) == v1_sid
    with pytest.raises(ValueError, match="replace=True"):
        t.tag("v1", t.snapshot_id)
    t.tag("v1", t.snapshot_id, replace=True)
    # released tag expires normally on the next pass
    t.drop_tag("v1")
    t.tag("latest")  # tagging current is fine and protects nothing extra
    t.expire_snapshots(keep_last=1, grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        t.snapshot(v1_sid)
    with pytest.raises(KeyError, match="no tag"):
        t.read(tag="nope")


def test_tags_read_paths_do_not_create_refs_dir(spark, warehouse):
    """Pure reads (tags() via snapshot/read/expire on an untagged table)
    must not pay a directory WRITE just to learn there are no tags — a
    read-only consumer or read-only mount would fail on it. The refs dir
    appears only on the first tag() write."""
    path = os.path.join(warehouse, "t")
    t = LakeTable.create(spark, path, SCHEMA)
    t.append(_df(spark, _rows(3)))
    refs_dir = os.path.join(path, "_log", "refs")
    assert t.tags() == {}
    t.read().count()
    t.snapshot()
    t.expire_snapshots(keep_last=1, grace_seconds=0)
    assert not os.path.exists(refs_dir), "read path created the refs dir"
    t.tag("v1")
    assert os.path.exists(refs_dir)
    assert t.tags() == {"v1": t.snapshot_id}


# --------------------------------------------------- read-time view guard
def test_to_view_assert_current_fails_loudly_on_stale_read(spark, warehouse):
    """Opt-in read-time staleness guard: after another handle commits, a
    query through the guarded view ERRORS (naming the fix) instead of
    silently serving the old-but-valid pinned rows; re-registering heals
    it, and this handle's own commits keep the live guarded view readable
    via auto-refresh."""
    path = os.path.join(warehouse, "t")
    a = LakeTable.create(spark, path, SCHEMA, bucket_by="k", bucket_count=2)
    a.append(_df(spark, _rows(4)))
    ident = a.to_view("guard.v", assert_current=True)
    assert spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n == 4

    b = LakeTable.load(spark, path)  # stand-in for another process
    b.append(_df(spark, _rows(2, base_day=9)))
    with pytest.raises(Exception, match="newer commits"):
        spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()

    # re-register → current again
    b.to_view("guard.v", assert_current=True)
    assert spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n == 6
    # b's OWN commit auto-refreshes its live guarded view (and must not
    # take the stamp-only fast path, whose text would trip its own guard)
    b.append(_df(spark, _rows(1, base_day=12)))
    assert spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n == 7
    # a metadata-only commit (fence write) also advances the probed log —
    # the guarded view must still read after auto-refresh
    b.append(_df(spark, []), fence_key="noop-1")
    assert spark.sql(f"SELECT count(*) AS n FROM {ident}").collect()[0].n == 7
    # unguarded views keep the old silent-staleness behavior
    b.to_view("guard.u")
    c = LakeTable.load(spark, path)
    c.append(_df(spark, _rows(1, base_day=13)))
    assert spark.sql("SELECT count(*) AS n FROM guard.u").collect()[0].n == 7


# ------------------------------------------- catalog cross-process refresh
def test_catalog_refresh_views_noop_from_fresh_catalog(spark, warehouse):
    """The refresh fast path must work from a FRESH Catalog (cron process):
    with nothing committed since registration, refresh_views() returns {}
    and regenerates no view text — the decision reads the stamped
    lake.snapshot_id on the view, not in-memory pins."""
    cat = Catalog(spark, warehouse)
    t = cat.create_table("fp.t", SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(4)))
    cat.register_views()

    cat2 = Catalog(spark, warehouse)  # fresh object, empty pins
    assert cat2.refresh_views() == {}
    assert spark.sql("SELECT count(*) AS n FROM fp.t").collect()[0].n == 4
    # a commit is then detected by the same fresh catalog
    other = LakeTable.load(spark, cat.resolve("fp.t"))
    other.append(_df(spark, _rows(2, base_day=9)))
    assert set(cat2.refresh_views()) == {"fp.t"}
    assert spark.sql("SELECT count(*) AS n FROM fp.t").collect()[0].n == 6


def test_catalog_refresh_views_repoints_view_repinned_by_other_handle(
        spark, warehouse):
    """If another handle re-registered the catalog's view pinned to an OLD
    snapshot, the in-memory pin still matches latest — but refresh_views'
    contract is re-point-at-CURRENT, so the stamped-id check must catch it."""
    cat = Catalog(spark, warehouse)
    t = cat.create_table("rp.t", SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(3)))
    old_sid = t.snapshot_id
    t.append(_df(spark, _rows(2, base_day=9)))
    cat.register_views()
    assert spark.sql("SELECT count(*) AS n FROM rp.t").collect()[0].n == 5
    # another handle pins the same view name to the OLD snapshot
    other = LakeTable.load(spark, cat.resolve("rp.t"))
    other.to_view("rp.t", snapshot_id=old_sid)
    assert spark.sql("SELECT count(*) AS n FROM rp.t").collect()[0].n == 3
    refreshed = cat.refresh_views()
    assert set(refreshed) == {"rp.t"}, refreshed
    assert spark.sql("SELECT count(*) AS n FROM rp.t").collect()[0].n == 5


def test_catalog_drop_removes_view_for_three_part_name(spark, warehouse):
    """>2-part names collapse (a.b.c -> a_b.c) at view creation; the drop
    path must probe existence under the SAME collapsed identifier or it
    leaves exactly the dangling view it documents it removes."""
    cat = Catalog(spark, warehouse)
    t = cat.create_table("a.b.c", SCHEMA)
    t.append(_df(spark, _rows(3)))
    cat.register_views()
    assert spark.sql("SELECT count(*) AS n FROM a_b.c").collect()[0].n == 3
    cat.drop("a.b.c")
    with pytest.raises(Exception,
                       match="TABLE_OR_VIEW_NOT_FOUND|not found|cannot be found"):
        spark.sql("SELECT count(*) AS n FROM a_b.c").collect()


def test_catalog_refresh_preserves_assert_current_guard(spark, warehouse):
    """refresh_views must re-arm the read-time staleness guard a view opted
    into (stamped as lake.assert_current) — a refresh that silently
    disarmed it would turn the safety-critical reader back into the silent
    staleness it opted out of."""
    cat = Catalog(spark, warehouse)
    t = cat.create_table("gp.t", SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(4)))
    t.to_view("gp.t", assert_current=True)

    other = LakeTable.load(spark, cat.resolve("gp.t"))
    other.append(_df(spark, _rows(2, base_day=9)))
    with pytest.raises(Exception, match="newer commits"):
        spark.sql("SELECT count(*) AS n FROM gp.t").collect()
    assert set(cat.refresh_views()) == {"gp.t"}
    assert spark.sql("SELECT count(*) AS n FROM gp.t").collect()[0].n == 6
    # still guarded after the refresh
    another = LakeTable.load(spark, cat.resolve("gp.t"))
    another.append(_df(spark, _rows(1, base_day=12)))
    with pytest.raises(Exception, match="newer commits"):
        spark.sql("SELECT count(*) AS n FROM gp.t").collect()


def test_register_views_preserves_assert_current_guard(spark, warehouse):
    """Bulk re-registration (register_views) must not silently disarm the
    read-time staleness guard a view opted into — same preservation rule
    refresh_views follows."""
    cat = Catalog(spark, warehouse)
    t = cat.create_table("gp2.t", SCHEMA, bucket_by="k", bucket_count=2)
    t.append(_df(spark, _rows(4)))
    t.to_view("gp2.t", assert_current=True)

    cat2 = Catalog(spark, warehouse)  # fresh handle, e.g. a cron process
    cat2.register_views()
    other = LakeTable.load(spark, cat2.resolve("gp2.t"))
    other.append(_df(spark, _rows(2, base_day=9)))
    with pytest.raises(Exception, match="newer commits"):
        spark.sql("SELECT count(*) AS n FROM gp2.t").collect()

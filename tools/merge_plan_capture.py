"""Capture the physical plan of the MERGE rewrite in both formulations —
the r7 evidence artifact for the decision-path optimization (the declared
``cdc_replay_*`` queries' own plans only show the final table read; the
merge executes eagerly inside replay, so its plan is captured here).

Writes plans/r07/merge_rewrite_join.txt and merge_rewrite_decision.txt:
the ``out_rows`` plan (what ``_write_files`` executes, minus the final
bucket repartition+write common to both) for one representative replayed
batch at $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from cdm_data_loader_utils_spark import queries as Q  # noqa: E402
from cdm_data_loader_utils_spark.lake import table as TT  # noqa: E402
from cdm_data_loader_utils_spark.operators.lww import lww_dedup_agg  # noqa: E402
from cdm_data_loader_utils_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="merge-plan-capture",
                      master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r07",
    )
    os.makedirs(out_dir, exist_ok=True)

    ch = Q.events_as_changes(spark, sf_dir)
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    tmp = tempfile.mkdtemp(prefix="merge_plan_")
    t = TT.LakeTable.create(spark, os.path.join(tmp, "t"), schema,
                            bucket_by="conv_id", bucket_count=8)
    # batch 0 seeds the table; batch 1 is the captured representative merge
    b0 = ch.filter(F.pmod(F.col("lsn"), F.lit(2)) == 0)
    b1 = ch.filter(F.pmod(F.col("lsn"), F.lit(2)) == 1)
    t.merge_cdc(lww_dedup_agg(b0, ["conv_id", "turn_idx"], ["lsn", "ts"]),
                key_cols=["conv_id", "turn_idx"])

    src_raw = lww_dedup_agg(b1, ["conv_id", "turn_idx"], ["lsn", "ts"])
    snap = t.snapshot()
    full_schema = t.schema(snap)
    user_fields = [f for f in full_schema.fields
                   if f.name not in TT._META_COLS]
    new_user_schema = T.StructType(user_fields)
    src = src_raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name)
          for f in new_user_schema.fields],
        F.col("lsn").cast("long").alias(TT.META_LSN),
        (F.col("op") == F.lit("d")).alias(TT.META_DELETED),
    )
    manifests = t._require_v2(snap)
    entries = [fe for k in sorted(manifests)
               for fe in t._read_manifest(manifests[k])]
    tgt_rows = TT._align_to_schema(
        t._read_files(snap, entries, with_file_col=False), full_schema)

    def fmt(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")

    # join formulation (the pre-r7 shape / small-batch fallback)
    s, tt = src.alias("s"), tgt_rows.alias("t")
    key_cols = ["conv_id", "turn_idx"]
    joined = tt.join(s, on=key_cols, how="full_outer")
    s_lsn, t_lsn = F.col(f"s.{TT.META_LSN}"), F.col(f"t.{TT.META_LSN}")
    take_src = s_lsn.isNotNull() & (t_lsn.isNull() | (s_lsn > t_lsn))
    merged = joined.select(
        *[F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k)
          for k in key_cols],
        *[F.when(take_src, F.col(f"s.{f.name}"))
          .otherwise(F.col(f"t.{f.name}")).alias(f.name)
          for f in new_user_schema.fields if f.name not in key_cols],
        F.when(take_src, s_lsn).otherwise(t_lsn).alias(TT.META_LSN),
        F.when(take_src, F.col(f"s.{TT.META_DELETED}"))
        .otherwise(F.col(f"t.{TT.META_DELETED}")).alias(TT.META_DELETED),
    )
    join_rows = TT._align_to_schema(merged, full_schema)

    decision_rows = TT._merge_rows_decision(
        src, tgt_rows, key_cols, new_user_schema, full_schema)

    for name, df in (("merge_rewrite_join", join_rows),
                     ("merge_rewrite_decision", decision_rows)):
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(fmt(df))
        print(f"wrote {path}", file=sys.stderr)

    # row-identity spot check while we are here
    a = sorted(map(str, join_rows.collect()))
    b = sorted(map(str, decision_rows.collect()))
    assert a == b, "merge formulations diverged!"
    print(f"row-identical: {len(a)} rows", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Local harness mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the same
parquet tables, compare row count, schema (column names), and
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from cdm_data_loader_utils_spark import queries as q
    from cdm_data_loader_utils_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = q.queries(), q.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(
                tuple(canon(r[c]) for c in scols) for r in srows
            )
            # reclaim operator-internal caches between the 50 queries
            from cdm_data_loader_utils_spark.operators.cache import release
            release(sdf)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            if len(srows) == 0 and name != "noop":
                print(f"     WARNING: zero rows for rows-only query {name}")
            continue
        try:
            od = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        ocols = sorted(od.columns)
        oset = sorted(
            tuple(canon(v) for v in row)
            for row in od[ocols].itertuples(index=False, name=None)
        )
        if scols != ocols:
            failures.append((name, f"schema {scols} vs {ocols}"))
            print(f"FAIL {name}: schema mismatch {scols} vs {ocols}")
            continue
        if len(sset) != len(oset):
            failures.append((name, f"rowcount {len(sset)} vs {len(oset)}"))
            print(f"FAIL {name}: rowcount {len(sset)} vs {len(oset)}")
            continue
        diff = [i for i, (a, b) in enumerate(zip(sset, oset)) if a != b]
        if diff:
            i = diff[0]
            failures.append((name, f"values differ at {i}: {sset[i]} vs {oset[i]}"))
            print(f"FAIL {name}: {len(diff)} differing rows; first: {sset[i]} vs {oset[i]}")
            continue
        print(f"ok   {name}: {len(sset)} rows match")
    print(f"\n{len(failures)} failures / {len(only) if only else len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

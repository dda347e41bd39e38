"""Physical-plan inspection utilities.

The reference never examines Spark plans (it trusts Delta/Catalyst
blindly); at 100 TB the plan IS the product, so this module makes plan
properties assertable in tests and CI: filter pushdown reached the parquet
scan, column pruning shrank ReadSchema, small dims broadcast, and the hot
path stayed inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown proof)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Columns each scan actually reads (column pruning proof)."""
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan — the scale-cost headline."""
    return physical_plan(df).count("Exchange ")


def codegen_span_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen regions; fewer = wider fused pipelines."""
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", physical_plan(df)))
    return len(ids)


def broadcast_subtrees(df: DataFrame) -> list[str]:
    """The full operator subtree under each BroadcastExchange — lets a test
    assert WHAT is broadcast (e.g. tiny key tables are fine, a packed
    aggregate of the whole corpus is a scale bug)."""
    lines = physical_plan(df).splitlines()

    def indent(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-*"))

    out: list[str] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = indent(line)
        sub = [line]
        for nxt in lines[i + 1:]:
            if not nxt.strip():
                break
            if indent(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def plan_report(df: DataFrame) -> dict:
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schema_columns(df),
        "broadcast_join": has_broadcast_join(df),
        "shuffles": shuffle_count(df),
        "codegen_spans": codegen_span_count(df),
    }


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-column filters applied at LISTING time (partition pruning
    proof — directories outside the filter are never listed or scanned).
    One list element per filter: split on TOP-LEVEL commas only, so an
    IN-list like ``bucket#12 IN (3,5,9)`` stays one filter instead of
    fragmenting."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        depth, start = 0, 0
        for i, ch in enumerate(body + ","):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                part = body[start:i].strip()
                if part:
                    out.append(part)
                start = i + 1
    return out

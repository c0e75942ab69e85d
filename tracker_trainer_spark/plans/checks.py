"""Physical-plan introspection: the feedback loop for 100 TB posture.

Every operator's plan should be *inspected*, not assumed: filters pushed
to the parquet scan, column pruning in ReadSchema, small dims broadcast,
no extra shuffles. These helpers parse ``explain("formatted")`` output so
plan-shape assertions live in the test suite (tests/test_plan_quality.py)
and regress loudly when a change de-optimizes a query.

(The reference hand-implements pushdown/pruning as explicit column lists
and fastparquet filters — src/trainer/code/parquet_io.py:32,109,167-188;
here Catalyst does it, and these checks prove it happened.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (classic PySpark, JVM-side)."""
    jdf = df._jdf  # noqa: SLF001 — no public API returns the plan string
    jvm = df.sparkSession._jvm  # noqa: SLF001
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def count_shuffles(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges (BroadcastExchange and
    ReusedExchange excluded). Matches both formatted-mode node headers
    ("(5) Exchange") and simple-mode inline nodes ("Exchange hashpartitioning")."""
    plan = physical_plan(df)
    formatted = len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.MULTILINE))
    if formatted:
        return formatted
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hash|range|SinglePartition|rebalance)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or \
        "BroadcastNestedLoopJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (flattened)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan."""
    plan = physical_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def scan_columns(df: DataFrame) -> list[set]:
    """Column-name sets actually read from each parquet scan."""
    cols = []
    for schema in read_schemas(df):
        inner = schema[len("struct<"):].rstrip(">")
        names = {f.split(":")[0].strip() for f in _split_top_level(inner) if f}
        cols.append(names)
    return cols


def _split_top_level(s: str) -> list[str]:
    """Split struct field list on commas not nested inside <>."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts

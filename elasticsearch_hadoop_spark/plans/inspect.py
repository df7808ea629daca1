"""Physical-plan inspection helpers (the `.explain("formatted")` toolkit).

The corpus docstrings make scale promises — "filters reach the scan",
"dims broadcast", "one shuffle" — and tests/test_plans.py pins them with
these helpers. They are also useful interactively: a quick
``count_nodes(formatted_plan(df), "Exchange")`` answers "would this plan
survive a 100× scale-up" faster than reading the whole explain output.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`df.explain("formatted")` as a string (Spark only prints it)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_nodes(plan: str, node: str) -> int:
    """Count physical operators named ``node`` ("Exchange",
    "BroadcastHashJoin", "SortMergeJoin", ...) in a formatted plan."""
    return len(re.findall(rf"^\(\d+\) {node}\b", plan, flags=re.M))


def pushed_filters(plan: str) -> list[str]:
    """Every non-empty `PushedFilters: [...]` payload from the plan's scans."""
    return [p.strip() for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p.strip()]


def read_schema_columns(plan: str) -> set[str]:
    """Column names the (first) scan actually reads — column-pruning probe."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return set()
    return {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}


def complex_output_cols(schema) -> list[str]:
    """Columns whose type would hit the correctness driver's raw-array
    serialization trap (round-1 agg_collect_set failure): the value hash is
    only stable for scalar columns, so corpus queries must serialize
    arrays/maps/structs (array_join / to_json) before returning.  Shared by
    tests/oracle_harness.py and tools/sweep_output_types.py — one predicate,
    one place."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]

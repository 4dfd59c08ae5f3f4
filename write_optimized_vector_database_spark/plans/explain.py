"""Physical-plan inspection helpers.

The scale contract of this engine is enforceable from the plan text:
filters must reach the Parquet scan (PushedFilters), small sides must
broadcast, scans must prune columns (ReadSchema), and shuffle counts
must stay flat as data grows. tests/test_plans.py pins these.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists appearing in the formatted plan."""
    out = []
    for line in explain_str(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out

def read_schemas(df: DataFrame) -> list[str]:
    out = []
    for line in explain_str(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line.removeprefix("ReadSchema:").strip())
    return out


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count (Exchange operators, excluding broadcast exchanges) —
    the number that must not grow with data size."""
    plan = explain_str(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    plan = explain_str(df, "simple")
    return "BroadcastExchange" in plan or "BroadcastHashJoin" in plan or (
        "BroadcastNestedLoopJoin" in plan
    )

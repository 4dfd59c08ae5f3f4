"""Regenerate docs/OPERATORS.md from the query registry.

One row per registered query: name, SURVEY.md reference, tags, oracle
kind, and the defining module — the line-by-line coverage index,
derived from the code so it can never drift from it.

Usage: python tools/gen_operator_index.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from write_optimized_vector_database_spark.queries import registry

    reg = registry()
    by_module: dict[str, list] = defaultdict(list)
    for name, q in reg.items():
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        by_module[mod].append((name, q))

    lines = [
        "# Operator / query index",
        "",
        f"{len(reg)} registered queries, every one with a DuckDB oracle twin,",
        "hash-compared by the driver (and `tools/driver_sim.py`) at sf0.01.",
        "The first 50 entries are the driver's correctness window.",
        "Regenerate with `python tools/gen_operator_index.py` — this file is",
        "derived from the registry and never edited by hand.",
        "",
        "## Planner contracts",
        "",
        "- **Filtered two-phase pre/post (VERDICT r07 #5):** "
        "`plan_filtered_strategy` sizes the POST branch's over-fetch from "
        "manifest selectivity stats (zero jobs). Because a stale "
        "over-estimate would silently under-fetch and cost recall, the "
        "manifest tracks a `rows_since_analyze` odometer (bumped by "
        "`ingest`, reset by `analyze`/`compact`); once appends exceed "
        "20% of the analyzed row count the planner falls back to **pre** "
        "— the allowed-id semi-join, which has no recall cliff — until "
        "stats are refreshed. Explicit `filter_strategy=\"post\"` still "
        "forces post. Gate: "
        "`tests/test_filtered_two_phase.py::test_stale_stats_planner_falls_back_to_pre`.",
        "",
    ]
    order = list(reg)
    window = set(order[:50])
    for mod in sorted(by_module):
        entries = by_module[mod]
        lines.append(f"## {mod} ({len(entries)})")
        lines.append("")
        lines.append("| query | survey ref | tags | in driver window |")
        lines.append("|---|---|---|---|")
        for name, q in sorted(entries):
            w = "yes" if name in window else ""
            lines.append(
                f"| `{name}` | {q.survey_ref} | {', '.join(q.tags)} | {w} |"
            )
        lines.append("")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "OPERATORS.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(reg)} queries in {len(by_module)} modules")


if __name__ == "__main__":
    main()

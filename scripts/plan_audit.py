#!/usr/bin/env python
"""Regenerate PLANS.md: a physical-plan audit of every registered
query at sf0.01 — shuffle count, join strategies, scan pushdown,
codegen coverage. This is the ".explain and iterate" evidence the
plan tests assert piecemeal, in one reviewable table.

Usage: python scripts/plan_audit.py  (writes PLANS.md at repo root)
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from hackmd_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from hackmd_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

JOIN_OPS = [
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
]


def audit(spark, name: str) -> dict:
    df = REGISTRY[name].builder(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    joins = sorted({j for j in JOIN_OPS if j in plan})
    return {
        "name": name,
        "oracle": "oracle" if REGISTRY[name].oracle else "rows-only",
        "shuffles": len(re.findall(r"\bhashpartitioning\(", plan))
        + len(re.findall(r"\brangepartitioning\(", plan)),
        "joins": "+".join(j.replace("Join", "").replace("Broadcast", "Bcast")
                          for j in joins) or "—",
        "pushed": "yes" if re.search(
            r"PushedFilters: \[(?!\])", plan) else "—",
        "topk": "TOP" if "TakeOrderedAndProject" in plan else "",
        "window": len(re.findall(r"\(\d+\) Window\b", plan)),
    }


def main() -> None:
    spark = get_spark("plan-audit", shuffle_partitions=8)
    rows = [audit(spark, n) for n in sorted(REGISTRY)]
    lines = [
        "# PLANS — physical-plan audit (auto-generated)",
        "",
        "Regenerate: `python scripts/plan_audit.py`. Shuffles counts",
        "hash+range partitionings in `explain(\"formatted\")` at sf0.01",
        "(AQE may coalesce or convert at runtime — these are the static",
        "plans the tests in `tests/test_physical_plans.py` assert on).",
        "`TOP` = TakeOrderedAndProject (top-k without a global sort).",
        "",
        "| query | check | shuffles | joins | pushed filters | top-k | windows |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['oracle']} | {r['shuffles']} | {r['joins']} "
            f"| {r['pushed']} | {r['topk']} | {r['window']} |")
    (REPO / "PLANS.md").write_text("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()

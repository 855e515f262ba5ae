"""Capture .explain('formatted') for named registry queries into
plans/r12/<query>_<tag>.txt (the r12 optimization round's before/after
plan evidence).

Usage:
  python scripts/capture_plans_r12.py <tag> <query> [...]
  OUT_DIR=/root/repo/plans/r12 python scripts/capture_plans_r12.py before q1 q2

Run from a pristine worktree for the "before" captures and from the
optimized tree for "after".
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = Path(os.environ.get("OUT_DIR", "/root/repo/plans/r12"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    from hackmd_data_pipeline_spark.plans import REGISTRY
    from hackmd_data_pipeline_spark.session import get_spark

    spark = get_spark("capture_plans_r12")
    REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR).count()
    for name in names:
        df = REGISTRY[name].builder(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        (OUT_DIR / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

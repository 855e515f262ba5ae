"""Scaling-evidence bench (r11 VERDICT item 4): time a named subset
of registry entries at $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS with
the bench.py methodology (warmups + min of N builder+count runs) and
write one JSON artifact, so an 8c-vs-32c pair at sf1 is a committed,
reproducible record rather than a transcript claim.

Usage:
  SPARK_GRAFT_SF_DIR=/root/scaledata/sf1 SPARK_GRAFT_CPUS=32 \
      python scripts/scale_evidence_r12.py OUT.json q1 q2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hackmd_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from hackmd_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/scaledata/sf1")
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("scale_evidence_r12")
    REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR).count()
    n_workers = spark.sparkContext.defaultParallelism

    def _noop(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches

    (spark.range(0, n_workers * 4, 1, n_workers)
     .mapInPandas(_noop, "id long").count())

    timings: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in names:
        runs = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            try:
                REGISTRY[name].builder(spark, SF_DIR).count()
            except Exception as exc:  # record, keep going
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                break
            runs.append(round(time.perf_counter() - t0, 3))
        if runs:
            timings[name] = runs
        print(name, runs or errors.get(name), flush=True)
    out = {
        "purpose": "r12 scaling evidence (8c vs 32c at sf1)",
        "sf_dir": SF_DIR,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "iters": ITERS,
        "queries": {n: min(r) for n, r in timings.items()},
        "iterations": timings,
        "errors": errors,
        "loadavg": list(os.getloadavg()),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()

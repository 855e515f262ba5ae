"""Targeted re-bench: bench.py methodology (warmups + min of N
builder+count runs) over a named subset, with the delta vs a reference
BENCH_LOCAL artifact — the measure/re-measure loop of the optimization
round without paying a full 181-query pass per iteration.

Usage: python scripts/bench_subset.py [-r REF.json] q1 q2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hackmd_data_pipeline_spark.plans import REGISTRY  # noqa: E402
from hackmd_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))


def main() -> None:
    args = sys.argv[1:]
    ref_path = "BENCH_LOCAL_r11_run2.json"
    if args and args[0] == "-r":
        ref_path = args[1]
        args = args[2:]
    ref = {}
    p = Path(__file__).resolve().parent.parent / ref_path
    if p.exists():
        ref = json.loads(p.read_text()).get("queries", {})

    spark = get_spark("bench_subset")
    REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR).count()
    n_workers = spark.sparkContext.defaultParallelism

    def _noop(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches

    (spark.range(0, n_workers * 4, 1, n_workers)
     .mapInPandas(_noop, "id long").count())

    total_new = total_ref = 0.0
    for name in args:
        runs = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            REGISTRY[name].builder(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        best = min(runs)
        r = ref.get(name)
        total_new += best
        total_ref += r or 0.0
        delta = f"  ref {r:.3f}  ratio {best / r:.2f}" if r else ""
        print(f"{best:7.3f}  {name}{delta}", flush=True)
    if total_ref:
        print(f"subset total {total_new:.3f} vs ref {total_ref:.3f} "
              f"({total_new / total_ref:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()

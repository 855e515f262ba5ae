"""Incremental-store amortization measurement (r06 VERDICT item 4):
a FIXED new batch deduped against 1x / 10x / 100x stores. The claim
under test: per-batch cost of operators/dedup_store.py::
incremental_pairs is governed by batch size x bucket collisions, NOT
by corpus size — the property that makes the persisted store the
continuously-ingesting 100 TB posture (corpus text never rescanned).

Protocol (the SCALE.md replica recipe): stored side = sf0.1 documents
with doc_id % 4 != 0, replicated REPL x with ids shifted +i*1e7 and
text prefixed "r{i} " (replicas are near-dups, not exact dups — the
prefix perturbs every leading shingle). Batch = the FIXED 1,250 base
docs with doc_id % 4 == 0, identical at every scale. Store built once
per scale (build wall recorded separately); the per-batch join timed
warm, min of ITERS.

Run:  python scripts/incremental_store_scale.py            # all scales
      REPLS=1,10 python scripts/incremental_store_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.dedup_store import (
    build_dedup_store,
    incremental_pairs,
)

SF = os.environ.get("SF", "/root/testdata/sf0.1")
REPLS = [int(x) for x in os.environ.get("REPLS", "1,10,100").split(",")]
ITERS = int(os.environ.get("ITERS", "3"))

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF}/documents.parquet")
batch = docs.filter(F.col("doc_id") % 4 == 0).localCheckpoint()
base_stored = docs.filter(F.col("doc_id") % 4 != 0)
print(f"fixed batch: {batch.count()} docs")

for repl in REPLS:
    stored = base_stored
    if repl > 1:
        reps = spark.range(repl).select(F.col("id").alias("rep"))
        stored = (base_stored.crossJoin(reps)
                  .withColumn("doc_id",
                              F.col("doc_id") + F.col("rep") * 10_000_000)
                  .withColumn("text",
                              F.concat(F.format_string("r%d ", "rep"),
                                       F.col("text")))
                  .drop("rep"))
    dest = f"/tmp/graft_incr_scale_{repl}x"
    shutil.rmtree(dest, ignore_errors=True)
    t0 = time.perf_counter()
    build_dedup_store(stored, dest, jaccard_threshold=0.3,
                      through="signatures")
    build_s = time.perf_counter() - t0
    n_stored = spark.read.parquet(dest + "/signatures").count()

    runs = []
    n_pairs = None
    for _ in range(ITERS + 1):  # first run warms; min over the rest
        t0 = time.perf_counter()
        n_pairs = incremental_pairs(batch, dest,
                                    jaccard_threshold=0.3).count()
        runs.append(time.perf_counter() - t0)
    print(f"store {repl:>3}x: {n_stored:>7} stored docs | "
          f"build {build_s:6.1f} s | per-batch "
          f"{min(runs[1:]):6.2f} s (runs: "
          f"{', '.join(f'{r:.2f}' for r in runs)}) | "
          f"{n_pairs} pairs")

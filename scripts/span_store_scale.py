"""Incremental exact-substring (span store) amortization (r09,
VERDICT item 2): a FIXED new batch's duplicated-span report against
1x / 10x / 100x span stores. The claim under test: per-batch cost of
``operators/dedup_store.incremental_spans`` is governed by batch
spans, not store size — batch hashes broadcast, the store's (id, h)
table STREAMS through a semi-join and partial-aggregates to <=
|batch hashes| count rows before its exchange.

Protocol (the SCALE.md replica recipe): stored side = sf0.1 documents
with doc_id % 4 != 0, replicated REPLx with ids shifted +i*1e7 and
text prefixed "r{i} " (replicas still share every INTERIOR >= 32-token
span with the base doc, so duplicate-witness fan-in genuinely grows
with the store — the semi-join output is ~REPL rows per batch hash,
absorbed map-side). Batch = the FIXED % 4 == 0 docs. Store committed
once per scale (commit wall recorded); the per-batch report timed
warm, min of ITERS.

Run:  python scripts/span_store_scale.py
      REPLS=1,10 ITERS=2 python scripts/span_store_scale.py
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
    commit_spans,
    incremental_spans,
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
batch = (docs.filter(F.col("doc_id") % 4 == 0)
         .select("doc_id", "text").localCheckpoint())
base_stored = docs.filter(F.col("doc_id") % 4 != 0).select("doc_id", "text")
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
    dest = f"/tmp/graft_span_scale_{repl}x"
    shutil.rmtree(dest, ignore_errors=True)
    t0 = time.perf_counter()
    commit_spans(stored, dest, epoch_id=0)
    commit_s = time.perf_counter() - t0
    n_rows = spark.read.parquet(dest + "/spans").count()

    runs = []
    n_dup = None
    for _ in range(ITERS + 1):  # first run warms; min over the rest
        t0 = time.perf_counter()
        n_dup = (incremental_spans(batch, dest)
                 .filter(F.col("n_dup_spans") > 0).count())
        runs.append(time.perf_counter() - t0)
    print(f"store {repl:>3}x: {n_rows:>9} span rows | commit "
          f"{commit_s:6.1f} s | per-batch {min(runs[1:]):6.2f} s (runs: "
          f"{', '.join(f'{r:.2f}' for r in runs)}) | "
          f"{n_dup} batch docs with dup spans")

"""Ingest exact-id-skip scaling (r08 VERDICT item 1): a FIXED batch's
table-wide already-stored skip against 1x / 10x / 100x signature
stores, with the bounded two-step form (operators/joins.py::
bounded_anti_join) the streams now run.

The claim under test: per-batch skip cost — and, critically, the
BROADCAST build-side cardinality — is governed by batch size, not
store size. The old form broadcast the store's entire id column per
micro-batch (build rows = |store|, monotonically growing, OOM at
10^9+ ids); the bounded form broadcasts (a) the batch's distinct keys
and (b) the matched set, both <= |batch| BY CONSTRUCTION at every
store scale. Both broadcast cardinalities are printed per scale so
the boundedness is visible in the numbers, not just the plan (the
plan shape itself is asserted in tests/test_physical_plans.py).

Protocol: stores are the SCALE.md replica recipe (sf0.1 documents,
doc_id % 4 != 0, replicated REPLx with ids shifted +i*1e7), built
through="signatures" — the exact table the neardup stream's skip
reads. The fixed batch is half already-stored ids (% 8 == 1) and half
fresh (% 8 == 0), identical at every scale. Wall = min over ITERS
warm runs of the full skip (anti-join count).

Run:  python scripts/ingest_id_skip_scale.py
      REPLS=1,10 ITERS=2 python scripts/ingest_id_skip_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.dedup_store import build_dedup_store
from hackmd_data_pipeline_spark.operators.joins import bounded_anti_join

SF = os.environ.get("SF", "/root/testdata/sf0.1")
REPLS = [int(x) for x in os.environ.get("REPLS", "1,10,100").split(",")]
ITERS = int(os.environ.get("ITERS", "3"))

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF}/documents.parquet")
batch = docs.filter(F.col("doc_id") % 8 < 2).localCheckpoint()
base_stored = docs.filter(F.col("doc_id") % 4 != 0)
n_batch = batch.count()
print(f"fixed batch: {n_batch} docs (~half already stored)")

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
    dest = f"/tmp/graft_idskip_scale_{repl}x"
    shutil.rmtree(dest, ignore_errors=True)
    build_dedup_store(stored, dest, jaccard_threshold=0.3,
                      through="signatures")
    stored_ids = spark.read.parquet(dest + "/signatures").select("doc_id")
    n_stored = stored_ids.count()

    # broadcast build-side cardinalities: what each form would ship
    matched = (stored_ids
               .join(F.broadcast(batch.select("doc_id").distinct()),
                     "doc_id", "left_semi").distinct())
    n_matched = matched.count()

    runs = []
    n_fresh = None
    for _ in range(ITERS + 1):  # first run warms; min over the rest
        t0 = time.perf_counter()
        n_fresh = bounded_anti_join(batch, stored_ids, "doc_id").count()
        runs.append(time.perf_counter() - t0)
    print(f"store {repl:>3}x: {n_stored:>7} stored ids | skip wall "
          f"{min(runs[1:]):5.2f} s (runs: "
          f"{', '.join(f'{r:.2f}' for r in runs)}) | broadcast rows: "
          f"bounded={max(n_matched, n_batch)} (matched {n_matched} + "
          f"batch keys {n_batch}) vs naive={n_stored} | "
          f"{n_fresh} fresh")

"""Incremental cluster-maintenance scaling (r07 VERDICT item 1 "Done"
criterion): update_clusters cost must be ∝ TOUCHED components + batch
pairs, NOT store size.

Protocol: stored side = sf0.1 documents with doc_id % 4 != 0 (the
components the fixed batch actually touches) PLUS (REPL-1) x filler
replicas whose every token is suffixed ":r<i>" — every shingle differs
from the base corpus, so the filler inflates the persisted
shingle/signature/pair/cluster stages 10x/100x while remaining
UNTOUCHED by the batch. The full chain (through="clusters") is built
once per scale; then the fixed 1,250-doc batch (% 4 == 0) runs the
per-batch maintenance loop — incremental_pairs + update_clusters into
a fresh overlay — timed warm, min of ITERS. Flat wall across scales =
the claim holds; the store build wall (recorded separately) is the
one-time cost the updates amortize.

Run:  python scripts/cluster_update_scale.py            # all scales
      REPLS=1,10 python scripts/cluster_update_scale.py
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
    update_clusters,
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
        reps = spark.range(1, repl).select(F.col("id").alias("rep"))
        filler = (
            base_stored.crossJoin(reps)
            .withColumn("doc_id",
                        F.col("doc_id") + F.col("rep") * 10_000_000)
            # suffix every token with :r<i>: NO shingle survives, so
            # the filler is untouched bulk, not extra near-dups
            .withColumn("text", F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(x, F.lit(":r"),
                                       F.col("rep").cast("string"))),
                " "))
            .drop("rep"))
        stored = base_stored.unionByName(filler.select(*base_stored.columns))
    dest = f"/tmp/graft_clup_scale_{repl}x"
    shutil.rmtree(dest, ignore_errors=True)
    t0 = time.perf_counter()
    build_dedup_store(stored, dest, jaccard_threshold=0.3,
                      through="clusters")
    build_s = time.perf_counter() - t0
    n_stored = spark.read.parquet(dest + "/signatures").count()
    n_clustered = spark.read.parquet(dest + "/clusters").count()

    runs = []
    stats = None
    for i in range(ITERS + 1):  # first run warms; min over the rest
        overlay = f"{dest}_overlay"
        shutil.rmtree(overlay, ignore_errors=True)
        t0 = time.perf_counter()
        pairs = incremental_pairs(batch, dest, jaccard_threshold=0.3)
        stats = update_clusters(pairs, dest, epoch_id=0,
                                delta_root=overlay)
        runs.append(time.perf_counter() - t0)
    print(f"store {repl:>3}x: {n_stored:>7} stored docs, "
          f"{n_clustered:>7} clustered | build {build_s:6.1f} s | "
          f"per-batch maintain {min(runs[1:]):6.2f} s (runs: "
          f"{', '.join(f'{r:.2f}' for r in runs)}) | "
          f"{stats['n_reassigned']} reassigned")

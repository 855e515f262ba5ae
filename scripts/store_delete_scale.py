"""Deletion-repair scaling (r08): remove_docs cost must be ∝ TOUCHED
components + tombstone set, NOT store size — the cluster_update_scale
protocol applied to the right-to-be-forgotten path.

Protocol: same 1x/10x/100x stores as cluster_update_scale (sf0.1
documents + ``:r<i>``-suffixed untouched filler, full chain through
clusters at threshold 0.3). Per scale, the FIXED deletion set
(doc_id % 40 == 3 of the BASE corpus — ~125 docs, same components
touched at every scale) is removed into a fresh scratch overlay,
timed warm (min over post-warmup runs). Flat wall = the claim holds.

Run:  python scripts/store_delete_scale.py
      REPLS=1,10 python scripts/store_delete_scale.py
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
    remove_docs,
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
base_stored = docs.filter(F.col("doc_id") % 4 != 0)
dead = (docs.filter(F.col("doc_id") % 40 == 3)
        .select("doc_id").localCheckpoint())
print(f"fixed deletion set: {dead.count()} docs")

for repl in REPLS:
    stored = base_stored
    if repl > 1:
        reps = spark.range(1, repl).select(F.col("id").alias("rep"))
        filler = (
            base_stored.crossJoin(reps)
            .withColumn("doc_id",
                        F.col("doc_id") + F.col("rep") * 10_000_000)
            .withColumn("text", F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(x, F.lit(":r"),
                                       F.col("rep").cast("string"))),
                " "))
            .drop("rep"))
        stored = base_stored.unionByName(filler.select(*base_stored.columns))
    dest = f"/tmp/graft_clup_scale_{repl}x"  # shared with cluster_update_scale
    if not os.path.exists(dest + "/clusters/_SUCCESS"):
        t0 = time.perf_counter()
        build_dedup_store(stored, dest, jaccard_threshold=0.3,
                          through="clusters")
        print(f"built {repl}x store in {time.perf_counter() - t0:.1f} s")
    n_stored = spark.read.parquet(dest + "/signatures").count()
    n_clustered = spark.read.parquet(dest + "/clusters").count()

    runs = []
    stats = None
    for i in range(ITERS + 1):  # first run warms; min over the rest
        overlay = f"{dest}_del_overlay"
        shutil.rmtree(overlay, ignore_errors=True)
        t0 = time.perf_counter()
        stats = remove_docs(dead, dest, delta_root=overlay)
        runs.append(time.perf_counter() - t0)
    print(f"store {repl:>3}x: {n_stored:>7} stored docs, "
          f"{n_clustered:>7} clustered | delete-repair "
          f"{min(runs[1:]):6.2f} s (runs: "
          f"{', '.join(f'{r:.2f}' for r in runs)}) | "
          f"{stats['n_relabeled']} relabeled, {stats['n_retired']} retired")

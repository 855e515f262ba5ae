"""Incremental ANN-index maintenance scaling (r08): upsert_ivf_index
cost must be ∝ BATCH size, not index size — the ANN counterpart of
scripts/cluster_update_scale.py.

Protocol: base corpus = sf0.1 embeddings with vec_id % 4 in (1, 2)
PLUS (REPL-1) replicas under fresh vec_ids (same vectors — cells grow
uniformly, which is the point: a 100x index has 100x rows per cell at
fixed nlist, or fixed rows per cell at nlist ∝ N, the SCALE.md recall
discipline — both are built here). Per scale:

  * build the base index once (one-time cost, recorded);
  * UPSERT the fixed %4 == 3 batch (500 vectors) as an epoch delta,
    timed warm (min of ITERS) — the per-batch maintenance cost;
  * kNN-join the fixed %4 == 0 query batch through base ∪ delta,
    timed warm — the read-side cost the deltas add.

Flat upsert wall across scales = the claim holds (the kernel reads
kilobytes of centroids + the batch, never the index). Search wall at
nlist ∝ N should hold ~flat too (probed cells keep constant size).

Run:  python scripts/index_upsert_scale.py
      REPLS=1,10 NLIST_PROP=0 python scripts/index_upsert_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.similarity import (
    build_ivf_index,
    ivf_search_index,
    upsert_ivf_index,
)

SF = os.environ.get("SF", "/root/testdata/sf0.1")
REPLS = [int(x) for x in os.environ.get("REPLS", "1,10,100").split(",")]
ITERS = int(os.environ.get("ITERS", "3"))
NLIST_PROP = os.environ.get("NLIST_PROP", "1") == "1"

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
batch = (emb.filter(F.col("vec_id") % 4 == 3)
         .select("vec_id", "embedding").localCheckpoint())
queries = (emb.filter(F.col("vec_id") % 4 == 0)
           .select(F.col("vec_id").alias("query_id"), "embedding")
           .localCheckpoint())
base = emb.filter((F.col("vec_id") % 4).isin(1, 2)).select("vec_id", "embedding")
print(f"fixed upsert batch: {batch.count()} vectors; "
      f"fixed query batch: {queries.count()}")

for repl in REPLS:
    stored = base
    if repl > 1:
        reps = spark.range(1, repl).select(F.col("id").alias("rep"))
        filler = (base.crossJoin(reps)
                  .withColumn("vec_id",
                              F.col("vec_id") + F.col("rep") * 10_000_000)
                  .drop("rep"))
        stored = base.unionByName(filler)
    n = stored.count()
    nlist = 16 * repl if NLIST_PROP else 16
    dest = os.path.join(tempfile.gettempdir(),
                        f"graft_upsert_scale_{repl}x_p{os.getpid()}")
    shutil.rmtree(dest, ignore_errors=True)

    t0 = time.time()
    build_ivf_index(stored, dest, nlist=nlist)
    build_s = time.time() - t0

    up_best = srch_best = float("inf")
    for _ in range(ITERS):
        shutil.rmtree(dest + "/deltas", ignore_errors=True)
        t0 = time.time()
        upsert_ivf_index(batch, dest, epoch_id=0, out_partitions=4)
        up_best = min(up_best, time.time() - t0)
        t0 = time.time()
        ivf_search_index(spark, dest, queries, k=10, nprobe=6).count()
        srch_best = min(srch_best, time.time() - t0)

    print(f"repl={repl:>3}x  index={n:>7} vecs  nlist={nlist:>4}  "
          f"build={build_s:6.2f}s  upsert={up_best:5.2f}s  "
          f"knn_join={srch_best:5.2f}s")
    shutil.rmtree(dest, ignore_errors=True)

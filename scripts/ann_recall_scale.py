"""ANN recall at 10x/100x corpus scale, cells ∝ N (r06 VERDICT item
6): apply the SemDeDup cell-size-constant protocol (SCALE.md r06) to
the IVF and IVF-PQ recall twins, so the 0.50/0.60 floors measured at
sf0.001-0.1 are evidenced on large-N corpora too.

Protocol: sf0.1 embeddings (2,000 x dim-64 float vectors) replicated
REPL x with ids shifted +rep*1e7 and a DETERMINISTIC per-(id, rep,
dim) sinusoidal perturbation (±0.05) so replicas are near — not exact
— neighbors (exact replicas would saturate every query's true top-10
with guaranteed same-cell hits and measure nothing). Queries are the 3
base vectors (vec_id < 3), unperturbed, identical at every scale.
Centroids scale with the corpus (nlist = 16 * REPL, nprobe = 6 fixed)
— constant expected cell size, the faiss/SemDeDup posture — and the
bounded training sample scales with nlist (32 rows/cell). Recall is
micro-averaged top-10 overlap vs the exact brute-force baseline
computed on the SAME corpus.

Run:  python scripts/ann_recall_scale.py
      REPLS=1,10 ITERS=1 python scripts/ann_recall_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    ivfpq_topk,
)

SF = os.environ.get("SF", "/root/testdata/sf0.1")
REPLS = [int(x) for x in os.environ.get("REPLS", "1,10,100").split(",")]
ITERS = int(os.environ.get("ITERS", "2"))

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

base = spark.read.parquet(f"{SF}/embeddings.parquet")
queries = (base.filter(F.col("vec_id") < 3)
           .select(F.col("vec_id").alias("query_id"), "embedding")
           .localCheckpoint())


def replicate(df, repl: int):
    if repl == 1:
        return df
    reps = spark.range(repl).select(F.col("id").alias("rep"))
    perturbed = F.transform(
        "embedding",
        lambda x, i: (x.cast("double")
                      + F.when(F.col("rep") == 0, F.lit(0.0)).otherwise(
                          0.05 * F.sin(F.col("vec_id") * 131
                                       + F.col("rep") * 17 + i))
                      ).cast("float"))
    return (df.crossJoin(reps)
            .withColumn("embedding", perturbed)
            .withColumn("vec_id",
                        F.col("vec_id") + F.col("rep") * 10_000_000)
            .drop("rep"))


def recall_of(exact_rows, ann_rows) -> float:
    truth: dict[int, set[int]] = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    hit = sum(1 for r in ann_rows
              if r["vec_id"] in truth.get(r["query_id"], ()))
    return hit / sum(len(v) for v in truth.values())


for repl in REPLS:
    corpus = replicate(base, repl).localCheckpoint()
    n = corpus.count()
    nlist = 16 * repl
    cap = max(8192, 32 * nlist)

    t0 = time.perf_counter()
    exact = brute_force_topk(corpus, queries, k=10).collect()
    exact_s = time.perf_counter() - t0

    results = {}
    for name, fn in [
        ("ivf", lambda: ivf_topk(corpus, queries, k=10, nlist=nlist,
                                 nprobe=6, sample_cap=cap)),
        ("ivfpq", lambda: ivfpq_topk(corpus, queries, k=10, nlist=nlist,
                                     nprobe=6, m_sub=16, nbits=6,
                                     refine=4, sample_cap=cap)),
    ]:
        runs, rec = [], None
        for _ in range(ITERS):
            t0 = time.perf_counter()
            rows = fn().collect()
            runs.append(time.perf_counter() - t0)
            rec = recall_of(exact, rows)
        results[name] = (min(runs), rec)

    print(f"{repl:>3}x: {n:>6} vecs, nlist={nlist:<5} "
          f"exact {exact_s:5.1f} s | "
          f"ivf {results['ivf'][0]:5.1f} s recall {results['ivf'][1]:.3f} | "
          f"ivfpq {results['ivfpq'][0]:5.1f} s recall "
          f"{results['ivfpq'][1]:.3f}")

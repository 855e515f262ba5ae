"""Query-batch scaling for the persisted-index kNN join (r10 VERDICT
item 1): `_materialize_probe` used to collect nq x nprobe rows WITH
full query vectors to the driver and broadcast the query side — fine
for bounded batches, a driver OOM for the million-query kNN joins
retrieval-based decontamination runs. The r11 size gate
(`_resolve_probe`, `PROBE_BROADCAST_MAX_BYTES`) keeps the fast path
under the ceiling and flips to a DISTRIBUTED probe + planner-strategy
candidate join above it.

Protocol: one IVF index over the sf0.1 embeddings (%4 != 0, nlist 16);
query batches of N = 500 (the natural %4 == 0 batch) / 1e4 / 1e5
synthesized by tiling the embedding table with fresh query_ids (batch
CONTENT is irrelevant to the strategy decision — only nq is). Per N:
warm search wall (min over ITERS) under the DEFAULT 64 MB ceiling
(the gate itself decides: N=500/1e4 ride the broadcast path, 1e5
flips distributed) and the posture the gate chose; at N=1e4 the
search additionally runs FORCED both ways and the results are
asserted row-identical. The distributed plan is asserted hint-free.

Run:  python scripts/probe_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import hackmd_data_pipeline_spark.operators.similarity as sim_mod
from hackmd_data_pipeline_spark.operators.similarity import (
    _resolve_probe,
    build_ivf_index,
    ivf_search_index,
    load_ivf_centroids,
    probe_cells,
)

SF = os.environ.get("SF", "/root/testdata/sf0.1")
SIZES = [int(float(x)) for x in
         os.environ.get("SIZES", "500,10000,100000").split(",")]
ITERS = int(os.environ.get("ITERS", "3"))
NPROBE = 6

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
stored = emb.filter(F.col("vec_id") % 4 != 0)
nbase = emb.count()

idx = "/tmp/graft_probe_scale_idx"
shutil.rmtree(idx, ignore_errors=True)
build_ivf_index(stored, idx, nlist=16)
cents = load_ivf_centroids(spark, idx)
dim = cents.shape[1]


def batch_of(n: int):
    """n query rows with real vectors (tiled) and fresh unique ids."""
    if n <= nbase // 4:
        return (emb.filter(F.col("vec_id") % 4 == 0).limit(n)
                .select(F.col("vec_id").alias("query_id"), "embedding"))
    return (spark.range(n).withColumn("_k", F.col("id") % nbase)
            .join(emb.withColumnRenamed("vec_id", "_k"), "_k")
            .select(F.col("id").alias("query_id"), "embedding"))


print(f"# probe-gate sweep  sf={SF}  dim={dim}  nprobe={NPROBE}  "
      f"ceiling={sim_mod.PROBE_BROADCAST_MAX_BYTES >> 20} MB")
print("| N queries | probe rows | est MB | posture | warm search s |")
print("|---|---|---|---|---|")
for n in SIZES:
    q = batch_of(n)
    rows = n * NPROBE
    est_mb = rows * (dim * 8 + 48) / (1 << 20)
    _, _, bounded = _resolve_probe(
        probe_cells(q, cents, NPROBE, "query_id", "embedding"),
        "query_id", dim)
    posture = "broadcast" if bounded else "distributed"
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        ivf_search_index(spark, idx, q, k=10, nprobe=NPROBE).count()
        best = min(best, time.perf_counter() - t0)
    print(f"| {n} | {rows} | {est_mb:.1f} | {posture} | {best:.2f} |")

# identity + plan posture at the crossover size, forced both ways
n = 10_000
q = batch_of(n)
sim_mod.PROBE_BROADCAST_MAX_BYTES = 1 << 40
a = [tuple(r) for r in ivf_search_index(spark, idx, q, k=10,
                                        nprobe=NPROBE).collect()]
sim_mod.PROBE_BROADCAST_MAX_BYTES = 0
df = ivf_search_index(spark, idx, q, k=10, nprobe=NPROBE)
plan = df._jdf.queryExecution().analyzed().toString()
assert "ResolvedHint" not in plan, "distributed path must carry no hint"
b = [tuple(r) for r in df.collect()]
assert a == b, f"posture changed rows: {len(a)} vs {len(b)}"
print(f"# identity @ N={n}: {len(a)} rows IDENTICAL under both postures; "
      "distributed plan hint-free")
spark.stop()

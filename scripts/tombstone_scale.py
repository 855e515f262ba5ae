"""Tombstone-set scaling (r09 VERDICT item 5): the deletion-exclusion
anti-join must stay correct and sane as the outstanding tombstone set
grows between compactions — and the broadcast ceiling must actually
flip the posture instead of forcing an unbounded broadcast forever.

Protocol: one IVF index over the sf0.1 embeddings base (%4 in {1,2});
per tombstone-set size (1e2 / 1e4 / 1e5 ids — mostly synthetic ids
plus every %5==0 base id so exclusions are load-bearing), commit the
set via remove_vectors into a scratch delta root, then time the
index-backed search WARM (min over ITERS) twice: once under the
default 64 MB ceiling (set broadcasts) and once with the ceiling
forced to 0 (planner strategies — the posture a years-of-deletions
store lands in). Search results must be IDENTICAL under both, and the
forced-planner plan must carry no ResolvedHint of ours.

Run:  python scripts/tombstone_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import hackmd_data_pipeline_spark.operators.joins as joins_mod
import hackmd_data_pipeline_spark.operators.similarity as sim_mod
from hackmd_data_pipeline_spark.operators.similarity import (
    build_ivf_index,
    ivf_search_index,
    remove_vectors,
    upsert_ivf_index,
)

SF = os.environ.get("SF", "/root/testdata/sf0.1")
SIZES = [int(x) for x in os.environ.get("SIZES", "100,10000,100000").split(",")]
ITERS = int(os.environ.get("ITERS", "3"))

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
base = emb.filter((F.col("vec_id") % 4).isin(1, 2))
late = emb.filter(F.col("vec_id") % 4 == 3)
queries = emb.filter(F.col("vec_id") % 4 == 0).select(
    F.col("vec_id").alias("query_id"), "embedding")

idx = "/tmp/graft_tombstone_scale_idx"
shutil.rmtree(idx, ignore_errors=True)
build_ivf_index(base, idx, nlist=16)

for n in SIZES:
    droot = f"/tmp/graft_tombstone_scale_d{n}"
    shutil.rmtree(droot, ignore_errors=True)
    # an upsert delta too, so the exclusion spans generations
    upsert_ivf_index(late, idx, epoch_id=0, delta_root=droot,
                     out_partitions=4)
    live_dead = base.filter(F.col("vec_id") % 5 == 0).select("vec_id")
    synth = spark.range(10_000_000, 10_000_000 + n).select(
        F.col("id").alias("vec_id"))
    remove_vectors(live_dead.unionByName(synth), idx, delta_root=droot)

    rows: dict = {}
    walls: dict = {}
    for mode, ceiling in (("bcast", 64 << 20), ("planner", 0)):
        joins_mod.TOMBSTONE_BROADCAST_MAX_BYTES = ceiling
        sim_mod.TOMBSTONE_BROADCAST_MAX_BYTES = ceiling
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            got = ivf_search_index(spark, idx, queries, k=10, nprobe=6,
                                   delta_root=droot).collect()
            best = min(best, time.perf_counter() - t0)
        rows[mode] = sorted(map(tuple, got))
        walls[mode] = best
        # hint check on the data view alone (the search plan always
        # carries the PROBE's broadcast hint — that one is bounded by
        # the query batch, not by deletions)
        plan = (sim_mod.ivf_index_data(spark, idx, delta_root=droot)
                ._jdf.queryExecution().analyzed().toString())
        hinted = "ResolvedHint" in plan
        assert hinted == (mode == "bcast"), (mode, n)
    assert rows["bcast"] == rows["planner"], f"results diverged at n={n}"
    excluded = len({r[1] for r in rows["bcast"]} & {
        r.vec_id for r in live_dead.collect()})
    assert excluded == 0, "tombstoned id surfaced in search results"
    print(f"tombstones={n:>7}  bcast={walls['bcast']:.3f}s  "
          f"planner={walls['planner']:.3f}s  results identical, "
          f"hint flips correctly")

spark.stop()

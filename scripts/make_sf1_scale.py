"""Deterministic 10x scale-up of sf0.1 into /root/scaledata/sf1 —
the r12 scaling-evidence dataset (r11 VERDICT item 4: at sf0.1 every
query is job-floor-bound and 8 cores beat 32, so parallel speedup is
invisible; sf1 gives the heavy families enough rows to need cores).

Protocol (the ann_recall_scale.py discipline, applied to BOTH corpus
tables):

* documents: REPL=10 replicas, ids shifted +rep*10^8. Replica 0 is
  byte-identical to sf0.1. Replicas r>0 suffix EVERY whitespace token
  with `_r<r>` — pairwise shingle Jaccard WITHIN a replica is exactly
  the original corpus's (the transformation is a bijection on
  shingles), while CROSS-replica shingle sets are disjoint, so the
  near-dup pair count scales linearly (x10), not quadratically in
  REPL. That keeps the dedup pipelines' work shape the sf0.1 shape at
  10x the rows.
* embeddings: REPL=10, ids shifted +rep*10^7, replica 0 unperturbed,
  replicas r>0 perturbed by a deterministic per-(id, rep, dim)
  sinusoid (+-0.05) so replicas are near- but not exact neighbors.
* every other table: copied from sf0.1 unchanged (only the warmup and
  relational entries read them; the scaling subset is documents/
  embeddings-bound).

Deterministic end to end — no RNG, no timestamps. Output is NOT an
oracle dataset (DuckDB views are never pointed here); it exists only
for the committed BENCH_LOCAL_r12_sf1_c{8,32}.json scaling artifacts.

Run:  python scripts/make_sf1_scale.py            # writes /root/scaledata/sf1
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.session import get_spark

SRC = os.environ.get("SRC_SF", "/root/testdata/sf0.1")
DEST = os.environ.get("DEST_SF", "/root/scaledata/sf1")
REPL = int(os.environ.get("REPL", "10"))


def main() -> None:
    spark = get_spark("make_sf1")
    os.makedirs(DEST, exist_ok=True)

    d = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for r in range(REPL):
        if r == 0:
            parts.append(d)
            continue
        parts.append(d.select(
            (F.col("doc_id") + r * 100_000_000).alias("doc_id"),
            # suffix every token: within-replica Jaccard preserved
            # exactly, cross-replica shingle sets disjoint
            F.regexp_replace("text", r"(\S+)", f"$1_r{r}").alias("text"),
            *[c for c in d.columns if c not in ("doc_id", "text")]))
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{DEST}/documents.parquet")
    print("documents:", spark.read.parquet(f"{DEST}/documents.parquet").count())

    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(e.select("embedding").first()[0])
    eparts = []
    for r in range(REPL):
        if r == 0:
            eparts.append(e)
            continue
        # deterministic sinusoidal perturbation per (id, rep, dim):
        # +-0.05, no RNG (the ann_recall_scale.py formula)
        pert = F.transform(
            "embedding",
            lambda x, i: (x.cast("double")
                          + 0.05 * F.sin((F.col("vec_id") % 97)
                                         + F.lit(float(r)) * 1.7
                                         + i.cast("double") * 0.37))
            .cast("float"))
        eparts.append(e.select(
            (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
            pert.alias("embedding"),
            *[c for c in e.columns if c not in ("vec_id", "embedding")]))
    emb = eparts[0]
    for p in eparts[1:]:
        emb = emb.unionByName(p)
    emb.repartition(16).write.mode("overwrite").parquet(
        f"{DEST}/embeddings.parquet")
    print("embeddings:", spark.read.parquet(f"{DEST}/embeddings.parquet").count(),
          "dim", dim)

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        src_p, dst_p = f"{SRC}/{t}.parquet", f"{DEST}/{t}.parquet"
        if os.path.isdir(src_p):
            shutil.rmtree(dst_p, ignore_errors=True)
            shutil.copytree(src_p, dst_p)
        else:
            shutil.copy2(src_p, dst_p)
        print("copied", t)
    spark.stop()


if __name__ == "__main__":
    main()

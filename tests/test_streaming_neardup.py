"""Streaming near-dup ingest: content-level dedup against the
persisted MinHash store across micro-batch boundaries, exactly-once
per input file via the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.streaming.neardup import run_neardup_ingest
from hackmd_data_pipeline_spark.tables import load_table

from .conftest import SF_CORRECT


def _write_drop(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


def test_neardup_stream_dedups_across_batches(spark, tmp_path):
    docs_in = str(tmp_path / "in")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")

    base = (load_table(spark, SF_CORRECT, "documents")
            .filter(F.col("doc_id") < 40))

    # batch 1: 40 distinct docs + one in-batch clone (id 1_000_000 of doc 0)
    clone_in_batch = (base.filter(F.col("doc_id") == 0)
                      .withColumn("doc_id", F.lit(1_000_000).cast("long")))
    _write_drop(base.unionByName(clone_in_batch), docs_in)
    c1 = run_neardup_ingest(spark, docs_in, out_root, ckpt, store)
    assert c1 == {"kept": 40, "dropped": 1}

    corpus_ids = {r.doc_id for r in
                  spark.read.parquet(out_root + "/corpus").collect()}
    assert 0 in corpus_ids and 1_000_000 not in corpus_ids

    # batch 2: a clone of a STORED doc (dropped), a fresh doc (kept),
    # and an in-batch clone pair (min id kept)
    fresh = (load_table(spark, SF_CORRECT, "documents")
             .filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 42)))
    clone_of_stored = (base.filter(F.col("doc_id") == 5)
                       .withColumn("doc_id", F.lit(2_000_000).cast("long")))
    clone_a = fresh.filter(F.col("doc_id") == 40).withColumn(
        "doc_id", F.lit(3_000_000).cast("long"))
    _write_drop(fresh.unionByName(clone_of_stored).unionByName(clone_a), docs_in)
    c2 = run_neardup_ingest(spark, docs_in, out_root, ckpt, store)
    assert c2 == {"kept": 2, "dropped": 2}, c2  # 40,41 kept; clones dropped

    corpus_ids = {r.doc_id for r in
                  spark.read.parquet(out_root + "/corpus").collect()}
    assert {40, 41} <= corpus_ids
    assert 2_000_000 not in corpus_ids and 3_000_000 not in corpus_ids

    # the store tracks exactly the surviving corpus
    sig_ids = {r.doc_id for r in
               spark.read.parquet(store + "/signatures").collect()}
    assert sig_ids == corpus_ids

    # exactly-once: a re-run with the same checkpoint ingests nothing
    c3 = run_neardup_ingest(spark, docs_in, out_root, ckpt, store)
    assert c3 == {"kept": 0, "dropped": 0}
    assert spark.read.parquet(out_root + "/corpus").count() == len(corpus_ids)

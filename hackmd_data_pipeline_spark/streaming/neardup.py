"""Streaming NEAR-dup ingest: continuous corpus dedup against the
persisted MinHash store.

The reference dedups by exact id only (ON CONFLICT DO NOTHING,
reference src/core/pg_engine.py:113); ``run_ingest_stream`` mirrors
that for entry ids. A training-data corpus additionally needs
CONTENT-level near-dup filtering at ingest time — and recomputing
pairs over the whole corpus per micro-batch is exactly what doesn't
scale. This pipeline composes the two streaming/dedup pieces the repo
already has:

  * file source + ``trigger(availableNow=True)`` + checkpoint
    (exactly-once per file, the O-24/O-35 posture), and
  * ``operators/dedup_store.incremental_pairs`` (new batch's band
    buckets joined against PERSISTED signatures — per-batch work is
    O(batch), independent of corpus size).

Per micro-batch: docs that near-match a STORED doc are dropped; for
near-dup pairs WITHIN the batch the smallest doc_id is kept (greedy
min-id keeper — the standard near-dup policy; a doc pairing only
with an already-dropped doc is still dropped, deterministic and
order-free). Survivors are appended to the output corpus AND their
shingles + signatures are appended to the store, so the next batch
dedups against them too.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hashed_shingle_table, minhash_signatures_from
from ..operators.dedup_store import incremental_pairs


def _append_store(batch: DataFrame, dest: str, id_col: str, text_col: str,
                  num_hashes: int, shingle_n: int) -> None:
    sh = hashed_shingle_table(batch, id_col, text_col, shingle_n).persist()
    sh.write.mode("append").parquet(dest + "/shingles")
    (minhash_signatures_from(sh, id_col, num_hashes)
     .write.mode("append").parquet(dest + "/signatures"))
    sh.unpersist()


def run_neardup_ingest(spark: SparkSession, docs_path: str, out_root: str,
                       checkpoint: str, store_dest: str,
                       id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 16, bands: int = 4,
                       shingle_n: int = 3,
                       jaccard_threshold: float = 0.8) -> dict[str, int]:
    """Drain document parquet/json drops into a near-dup-free corpus.

    Returns {'kept': n, 'dropped': n}. Exactly-once per input file via
    the checkpoint; the store under ``store_dest`` is bootstrapped on
    the first batch and appended to afterwards.
    """
    from ..schemas import TPCH_SCHEMAS

    doc_schema = TPCH_SCHEMAS["documents"]
    counts = {"kept": 0, "dropped": 0}

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = (batch.filter(F.length(F.trim(text_col)) > 0)
                 .dropDuplicates([id_col]).persist())  # full rows kept
        n_in = batch.count()
        if n_in == 0:
            batch.unpersist()
            return

        store_exists = Path(store_dest + "/signatures").exists()
        if store_exists:
            pairs = incremental_pairs(
                batch, store_dest, id_col, text_col,
                num_hashes, bands, shingle_n, jaccard_threshold)
            new_ids = batch.select(F.col(id_col).alias("_nid"))
            # a pair side is "stored" iff it is not in this batch
            a_new = pairs.join(F.broadcast(new_ids),
                               pairs.id_a == F.col("_nid"), "left_semi")
            both_new = a_new.join(F.broadcast(new_ids),
                                  a_new.id_b == F.col("_nid"), "left_semi")
            vs_stored_b = pairs.join(F.broadcast(new_ids),
                                     pairs.id_a == F.col("_nid"), "left_anti")
            vs_stored_a = pairs.join(F.broadcast(new_ids),
                                     pairs.id_b == F.col("_nid"), "left_anti")
            drops = (
                both_new.select(F.col("id_b").alias("_drop"))   # keep min of in-batch pair
                .union(vs_stored_b.select(F.col("id_b").alias("_drop")))
                .union(vs_stored_a.select(F.col("id_a").alias("_drop")))
                .distinct()
            )
            survivors = batch.join(
                F.broadcast(drops), batch[id_col] == F.col("_drop"),
                "left_anti").persist()
        else:
            # bootstrap: in-batch dedup only (min-id keeper per pair)
            from ..operators.dedup import minhash_lsh_pairs
            pairs = minhash_lsh_pairs(batch, id_col, text_col, num_hashes,
                                      bands, shingle_n, jaccard_threshold,
                                      sort=False)
            drops = pairs.select(F.col("id_b").alias("_drop")).distinct()
            survivors = batch.join(
                F.broadcast(drops), batch[id_col] == F.col("_drop"),
                "left_anti").persist()

        n_kept = survivors.count()
        counts["kept"] += n_kept
        counts["dropped"] += n_in - n_kept
        survivors.write.mode("append").parquet(out_root + "/corpus")
        if n_kept:
            _append_store(survivors, store_dest, id_col, text_col,
                          num_hashes, shingle_n)
        survivors.unpersist()
        batch.unpersist()

    stream = (spark.readStream.schema(doc_schema)
              .parquet(docs_path))
    q = (stream.writeStream.foreachBatch(handle_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return counts

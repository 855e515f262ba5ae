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
    (each input file is READ once, the O-24/O-35 posture), and
  * ``operators/dedup_store.incremental_pairs`` (new batch's band
    buckets joined against PERSISTED signatures — per-batch work is
    O(batch), independent of corpus size).

Dedup semantics per micro-batch:

  * exact-id first: ids already in the store are dropped up front
    (broadcast anti-join vs stored signature ids) — the reference's
    ON CONFLICT DO NOTHING applies across the WHOLE table, not per
    batch, so a same-id doc arriving in a later file must be dropped
    even though the near-dup join's ``id_a != id_b`` can never flag
    it;
  * then near-dup: docs that near-match a STORED doc are dropped; for
    near-dup pairs WITHIN the batch the smallest doc_id is kept
    (greedy min-id keeper — deterministic and order-free).

Survivors are appended to the output corpus AND their shingles +
signatures are appended to the store, so the next batch dedups
against them too.

Effectively-once side effects: ``foreachBatch`` is at-least-once (a
failed micro-batch is retried with the SAME epoch_id), so every write
goes to an epoch-keyed partition directory (``.../epoch=<n>``) in
``overwrite`` mode, and a retry first wipes any partial output of its
own epoch before recomputing — replays converge to exactly the same
files instead of appending duplicates. Store/corpus existence checks
go through the Hadoop FileSystem API, so non-local URIs (hdfs://,
s3a://) behave the same as local paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup_store import (
    commit_batch,
    incremental_pairs,
    update_clusters,
)
from ..operators.joins import bounded_anti_join
from ..sources.fs import fs_delete, fs_exists


def _epoch_dir(root: str, epoch_id: int) -> str:
    return f"{root}/epoch={epoch_id}"


def _read_clean(spark: SparkSession, root: str, cols: list[str]) -> DataFrame:
    """Read an epoch-partitioned store table, projecting away the
    partition column so consumers see the flat schema."""
    return spark.read.parquet(root).select(*cols)


# store appends go through the batch-mode commit path (r07: lifted
# into operators/dedup_store.commit_batch so the registered
# dedup_store_commit_cycle query value-checks the same code the
# stream runs)
_append_store = commit_batch


def run_neardup_ingest(spark: SparkSession, docs_path: str, out_root: str,
                       checkpoint: str, store_dest: str,
                       id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 16, bands: int = 4,
                       shingle_n: int = 3,
                       jaccard_threshold: float = 0.8) -> dict[str, int]:
    """Drain document parquet drops into a near-dup-free corpus.

    Returns {'kept': n, 'dropped': n}. Each input file is processed
    once via the checkpoint; epoch-keyed overwrite writes make the
    side effects idempotent under micro-batch retry. The store under
    ``store_dest`` is bootstrapped on the first batch and appended to
    afterwards.
    """
    from ..schemas import TPCH_SCHEMAS

    doc_schema = TPCH_SCHEMAS["documents"]
    counts = {"kept": 0, "dropped": 0}

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        # Retry safety: wipe any partial output THIS epoch left behind
        # before reading the store — otherwise the batch's own partial
        # store rows would make its docs "already stored".
        for root in (out_root + "/corpus", store_dest + "/shingles",
                     store_dest + "/signatures"):
            fs_delete(spark, _epoch_dir(root, epoch_id))

        batch = (batch.filter(F.length(F.trim(text_col)) > 0)
                 .dropDuplicates([id_col]).persist())  # full rows kept
        n_in = batch.count()
        if n_in == 0:
            batch.unpersist()
            return

        store_exists = fs_exists(spark, store_dest + "/signatures")
        if store_exists:
            # exact-id dedup vs the WHOLE store (reference
            # pg_engine.py ON CONFLICT semantics are table-wide),
            # bounded form (r08 VERDICT item 1): the store's id column
            # STREAMS through a semi-join against the broadcast batch
            # keys, then only the matched (<= batch-sized) set is
            # broadcast for the anti-join — no broadcast here scales
            # with store size (the old form shipped the entire stored
            # id set per micro-batch: OOM at 10^9+ stored ids)
            stored_ids = _read_clean(
                spark, store_dest + "/signatures", [id_col])
            batch_new = bounded_anti_join(
                batch, stored_ids, id_col).persist()
            n_new = batch_new.count()
        else:
            batch_new, n_new = batch, n_in

        if n_new == 0:
            counts["dropped"] += n_in
            batch.unpersist()
            return

        if store_exists:
            pairs = incremental_pairs(
                batch_new, store_dest, id_col, text_col,
                num_hashes, bands, shingle_n, jaccard_threshold)
            new_ids = batch_new.select(F.col(id_col).alias("_nid"))
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
            survivors = batch_new.join(
                F.broadcast(drops), batch_new[id_col] == F.col("_drop"),
                "left_anti").persist()
        else:
            # bootstrap: in-batch dedup only (min-id keeper per pair)
            from ..operators.dedup import minhash_lsh_pairs
            pairs = minhash_lsh_pairs(batch_new, id_col, text_col, num_hashes,
                                      bands, shingle_n, jaccard_threshold,
                                      sort=False)
            drops = pairs.select(F.col("id_b").alias("_drop")).distinct()
            survivors = batch_new.join(
                F.broadcast(drops), batch_new[id_col] == F.col("_drop"),
                "left_anti").persist()

        n_kept = survivors.count()
        survivors.write.mode("overwrite").parquet(
            _epoch_dir(out_root + "/corpus", epoch_id))
        if n_kept:
            _append_store(survivors, store_dest, epoch_id, id_col, text_col,
                          num_hashes, shingle_n)
        # counts update LAST: a crash before this point replays the
        # epoch and converges to the same files
        counts["kept"] += n_kept
        counts["dropped"] += n_in - n_kept
        survivors.unpersist()
        if store_exists:
            batch_new.unpersist()
        batch.unpersist()

    stream = (spark.readStream.schema(doc_schema)
              .parquet(docs_path))
    q = (stream.writeStream.foreachBatch(handle_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return counts


def run_cluster_maintained_ingest(spark: SparkSession, docs_path: str,
                                  out_root: str, checkpoint: str,
                                  store_dest: str, id_col: str = "doc_id",
                                  text_col: str = "text",
                                  num_hashes: int = 16, bands: int = 4,
                                  shingle_n: int = 3,
                                  jaccard_threshold: float = 0.5
                                  ) -> dict[str, int]:
    """KEEP-ALL streaming ingest with per-batch cluster maintenance —
    the other near-dup deployment shape (r07 VERDICT item 1): instead
    of dropping near-dups at the door (``run_neardup_ingest``), every
    doc lands in the corpus and the store, and the PERSISTED cluster
    stage is merged incrementally per micro-batch
    (``operators/dedup_store.update_clusters``), so
    ``resolve_from_store(store_dest)`` serves fresh canonical/replica
    verdicts at any moment — no full ``dedup_clusters`` recompute
    ever runs. Downstream consumers pick their own policy later
    (keep-best by quality, keep-first, per-cluster sampling) without
    having lost any replica.

    Per micro-batch: wipe own epoch partials (replay convergence) ->
    near-dup pairs of the batch vs (store ∪ batch) — or in-batch LSH
    pairs on the bootstrap batch — -> corpus + store epoch commits ->
    ``update_clusters``. At-least-once replay converges: epoch-keyed
    corpus/store/pair writes overwrite themselves, and a replayed
    ``update_clusters`` recomputes the same touched subgraph against
    the current resolved view, appending a value-identical overlay
    (dir growth bounded by ``compact_clusters``). Pair computation is
    deliberately ordered BEFORE this epoch's store commit; on a replay
    the store already holds the epoch's signatures, which is
    value-harmless (batch x own-stored-copy pairs normalize to the
    in-batch pair set, and same-id self-pairs are cut by the join).

    Returns ``{"ingested": n, "clustered": n}`` (clustered = rows in
    the resolved cluster table after the drain)."""
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.dedup_store import load_clusters
    from ..schemas import TPCH_SCHEMAS

    doc_schema = TPCH_SCHEMAS["documents"]
    counts = {"ingested": 0}

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        for root in (out_root + "/corpus", store_dest + "/shingles",
                     store_dest + "/signatures"):
            fs_delete(spark, _epoch_dir(root, epoch_id))

        batch = (batch.filter(F.length(F.trim(text_col)) > 0)
                 .dropDuplicates([id_col]).persist())
        n_in = batch.count()
        if n_in == 0:
            batch.unpersist()
            return

        if fs_exists(spark, store_dest + "/signatures"):
            pairs = incremental_pairs(
                batch, store_dest, id_col, text_col,
                num_hashes, bands, shingle_n, jaccard_threshold)
        else:
            pairs = minhash_lsh_pairs(batch, id_col, text_col, num_hashes,
                                      bands, shingle_n, jaccard_threshold,
                                      sort=False)
        # materialize the pair set BEFORE the store commit mutates the
        # directories the pair plan reads (lazy evaluation would
        # otherwise compute pairs against a store that already holds
        # this epoch — value-identical, but only by the replay
        # argument above; first attempts shouldn't lean on it)
        pairs = pairs.localCheckpoint(eager=True)

        batch.write.mode("overwrite").parquet(
            _epoch_dir(out_root + "/corpus", epoch_id))
        commit_batch(batch, store_dest, epoch_id, id_col, text_col,
                     num_hashes, shingle_n)
        update_clusters(pairs, store_dest, epoch_id)
        counts["ingested"] += n_in
        batch.unpersist()

    stream = (spark.readStream.schema(doc_schema)
              .parquet(docs_path))
    q = (stream.writeStream.foreachBatch(handle_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    clustered = (load_clusters(spark, store_dest).count()
                 if fs_exists(spark, store_dest + "/cluster_deltas")
                 or fs_exists(spark, store_dest + "/clusters") else 0)
    return {"ingested": counts["ingested"], "clustered": clustered}


def run_deletion_stream(spark: SparkSession, requests_path: str,
                        checkpoint: str, store_dest: str) -> dict[str, int]:
    """Right-to-be-forgotten PROPAGATION as a stream (r08): drain
    deletion-request parquet drops (``doc_id`` rows — the shape a
    compliance queue produces) into ``operators/dedup_store.py::
    remove_docs`` per micro-batch, so tombstones commit and clusters
    repair continuously, without a maintenance window.

    At-least-once replay converges: a replayed batch re-tombstones
    already-dead ids (cumulative distinct — harmless) and its repair
    recomputes against the current resolved view, appending a
    value-identical overlay (the update_clusters replay posture).
    Returns ``{"requests": n, "retired": n, "relabeled": n}``."""
    from pyspark.sql import types as T

    from ..operators.dedup_store import remove_docs

    counts = {"requests": 0, "retired": 0, "relabeled": 0}
    schema = T.StructType().add("doc_id", T.LongType())

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.dropDuplicates(["doc_id"])
        n = batch.count()
        if n == 0:
            return
        stats = remove_docs(batch, store_dest)
        counts["requests"] += n
        counts["retired"] += stats["n_retired"]
        counts["relabeled"] += stats["n_relabeled"]

    stream = spark.readStream.schema(schema).parquet(requests_path)
    q = (stream.writeStream.foreachBatch(handle_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return counts


def run_span_ingest(spark: SparkSession, docs_path: str, out_root: str,
                    checkpoint: str, store_dest: str,
                    id_col: str = "doc_id", text_col: str = "text",
                    k: int = 32,
                    max_dup_fraction: float = 0.5) -> dict[str, int]:
    """Streaming EXACT-SUBSTRING ingest against the persisted span
    store (r09 — the streaming face of ``commit_spans`` /
    ``incremental_spans``, completing the span store's lifecycle
    symmetry with the MinHash store and the ANN index): drain document
    parquet drops; per micro-batch, report each new doc's verbatim
    duplicated-span coverage against store ∪ batch, DROP docs whose
    ``dup_fraction`` exceeds ``max_dup_fraction`` (the Lee et al.
    train-set cleaning policy — a doc that is mostly copies of
    already-ingested text carries little new signal and concentrates
    memorization risk), land survivors in the corpus, and commit the
    survivors' span hashes so later batches dedup against them too.

    Exactly-once discipline shared with ``run_neardup_ingest``:
    file-source checkpoint (each drop read once), epoch-keyed
    overwrite writes, own-epoch partial wipe before the store read, a
    bounded exact-id skip (``bounded_anti_join`` over the store's
    committed doc ledger — table-wide ON-CONFLICT semantics with no
    store-sized broadcast). The store layout adds ``docs/epoch=<n>``
    (``doc_id | n_tokens``) beside ``spans/epoch=<n>``: spans alone
    cannot be the id ledger because a shorter-than-k doc has no span
    rows and would be re-admitted on every replay.

    Deleted-id policy (r09 ADVICE, documented + observable): a
    ``remove_docs``-tombstoned id that is RE-SUBMITTED is still
    skipped while its ledger row physically exists — a deleted id is
    unreusable until ``compact_store`` separates the generations
    (re-admitting it earlier would commit span/ledger rows that every
    reader excludes by id and the next compaction would silently
    drop). After compaction both the ledger row and the tombstone are
    physically gone, so the same id is admissible as a fresh doc.
    The pre-compaction skips are counted separately
    (``skipped_tombstoned``) so the policy is visible to operators
    instead of folding into the ordinary duplicate-id skip count.

    Returns ``{"kept": n, "dropped_dup": n, "skipped_ids": n,
    "skipped_tombstoned": n}``."""
    from ..operators.dedup_store import (
        _gate_dead,
        commit_spans,
        incremental_spans,
        load_tombstones,
    )
    from ..operators.joins import bounded_anti_join
    from ..schemas import TPCH_SCHEMAS

    doc_schema = TPCH_SCHEMAS["documents"]
    counts = {"kept": 0, "dropped_dup": 0, "skipped_ids": 0,
              "skipped_tombstoned": 0}

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        for root in (out_root + "/corpus", store_dest + "/spans",
                     store_dest + "/docs"):
            fs_delete(spark, _epoch_dir(root, epoch_id))

        batch = (batch.filter(F.length(F.trim(text_col)) > 0)
                 .dropDuplicates([id_col]).persist())
        n_in = batch.count()
        if n_in == 0:
            batch.unpersist()
            return

        if fs_exists(spark, store_dest + "/docs"):
            stored_ids = _read_clean(spark, store_dest + "/docs", [id_col])
            fresh = bounded_anti_join(batch, stored_ids, id_col).persist()
            n_fresh = fresh.count()
            # surface tombstoned-id skips distinctly (the deleted-id
            # policy above); the tombstone side goes through the same
            # size-gated posture as every other tombstone anti-join
            # (_gate_dead: broadcast under the byte ceiling, planner
            # strategy above it — heavy-deletion regimes must not
            # force an unbounded driver broadcast here either)
            dead = (load_tombstones(spark, store_dest)
                    if n_fresh != n_in else None)
            if dead is not None:
                counts["skipped_tombstoned"] += (
                    batch.join(
                        _gate_dead(spark, store_dest,
                                   dead.select(F.col("id").alias(id_col))),
                        id_col, "left_semi")
                    .join(fresh.select(id_col), id_col, "left_anti")
                    .count())
        else:
            fresh, n_fresh = batch, n_in
        counts["skipped_ids"] += n_in - n_fresh
        if n_fresh == 0:
            batch.unpersist()
            return

        if fs_exists(spark, store_dest + "/spans"):
            report = incremental_spans(fresh, store_dest, id_col,
                                       text_col, k)
        else:
            # bootstrap batch: the full-corpus audit over the batch
            # itself (same semantics as incremental vs an empty store)
            from ..operators.dedup import exact_substring_spans
            report = exact_substring_spans(fresh, id_col, text_col, k)
        keep_ids = (report.filter(F.col("dup_fraction")
                                  <= F.lit(max_dup_fraction))
                    .select(id_col))
        survivors = fresh.join(F.broadcast(keep_ids), id_col,
                               "left_semi").persist()
        n_kept = survivors.count()
        survivors.write.mode("overwrite").parquet(
            _epoch_dir(out_root + "/corpus", epoch_id))
        if n_kept:
            commit_spans(survivors, store_dest, epoch_id, id_col,
                         text_col, k, out_partitions=4)
            (survivors
             .select(id_col,
                     F.size(F.split(F.lower(F.trim(F.col(text_col))),
                                    "[ \\t\\n\\x0B\\f\\r]+"))
                     .alias("n_tokens"))
             .coalesce(4)
             .write.mode("overwrite")
             .parquet(_epoch_dir(store_dest + "/docs", epoch_id)))
        counts["kept"] += n_kept
        counts["dropped_dup"] += n_fresh - n_kept
        survivors.unpersist()
        if fresh is not batch:
            fresh.unpersist()
        batch.unpersist()

    stream = spark.readStream.schema(doc_schema).parquet(docs_path)
    q = (stream.writeStream.foreachBatch(handle_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return counts

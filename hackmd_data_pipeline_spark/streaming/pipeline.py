"""Streaming ingest (SURVEY.md §2.I / §7 Phase 3).

The reference's orchestration — self-invoking Lambda micro-batches
(O-35, reference arxiv_collector.py:196-208 / arxiv_etl.py:157-168),
SKIP LOCKED file claiming (O-24), 6-month dedup lookback (O-37) —
collapses into one Structured Streaming pipeline:

  * file source + ``trigger(availableNow=True)`` drains everything
    pending then stops — the self-invocation loop.
  * the streaming checkpoint tracks processed files exactly-once —
    the claim/lock.
  * per micro-batch: within-batch first-wins dedup (O-23) plus a
    left-anti join against the canonical store's ids inside a bounded
    lookback window (O-22/O-37 — the reference's 6-month in-memory id
    set, arxiv_collector.py:123-134) — so a duplicate entry_id
    arriving in a later raw file is dropped, matching the reference's
    ON CONFLICT DO NOTHING primary-key semantics (pg_engine.py:113).
  * ``foreachBatch`` appends canonical + history and quarantines
    corrupt rows atomically per micro-batch (O-5'/O-28).

Exactly-once across a crash INSIDE a micro-batch (sinks written,
checkpoint not yet committed — the Lambda-death window the reference
survives via its pending/processing state machine, arxiv_etl.py:
181-204): on restart the batch replays, the canonical anti-join drops
every already-written id (so canonical and history see nothing), and
the quarantine sink anti-joins on source_path (a replayed file's bad
rows are already recorded). Driven end-to-end with an injected
mid-batch kill in tests/test_etl_e2e.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ingest import completeness_filter, idempotent_new_rows, to_canonical, to_history
from ..schemas import RAW_RECORD_SCHEMA
from ..sources.writers import write_partitioned_parquet


def run_ingest_stream(spark: SparkSession, raw_path: str, out_root: str,
                      checkpoint: str, lookback: str = "180 days",
                      dedup: bool = True,
                      etl_timestamp: Column | None = None,
                      max_files_per_trigger: int | None = None,
                      batch_hook: Callable[[int], None] | None = None,
                      ) -> dict[str, int]:
    """Drain raw jsonl[.gz] into canonical + history Parquet.

    Returns counts per sink. Exactly-once per file via the checkpoint:
    re-running with the same checkpoint ingests nothing new (O-24/O-5'
    idempotency). Cross-batch dedup: when ``dedup`` is set, incoming
    entry_ids are anti-joined against canonical rows whose
    etl_timestamp falls within ``lookback`` — the bounded build side
    broadcasts at scale, exactly the reference's 6-month id-set trick.
    Both properties are asserted in tests/test_ingest_pipeline.py.

    ``etl_timestamp`` pins the canonical lineage timestamp (a
    reprocessing run that must reproduce a prior store byte-for-byte
    passes the original run's timestamp; default: wall clock).
    ``max_files_per_trigger`` bounds each micro-batch (scale knob:
    keeps the per-batch anti-join build side and sink commit small).
    ``batch_hook(epoch_id)`` runs AFTER the sinks are written but
    BEFORE the checkpoint commits — the crash window the e2e
    kill/restart test injects into; production hooks can emit
    metrics from the same seam.
    """
    canonical_path = f"{out_root}/papers"
    quarantine_path = f"{out_root}/quarantine"
    reader = (
        spark.readStream.schema(RAW_RECORD_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = (
        reader.json(raw_path)
        # per-file lineage (reference s3_path per row, arxiv_etl.py:85):
        # input_file_name() works on file-source streams; a glob-root
        # literal would collapse every row to the same path
        .withColumn("source_path", F.input_file_name())
    )

    counts = {"canonical": 0, "history": 0, "quarantine": 0}

    def _freeze(df: DataFrame) -> tuple[DataFrame, tuple]:
        """Eagerly materialize ``df`` via localCheckpoint, returning the
        ids of the blocks the checkpoint ACTUALLY persisted so the batch
        can free them when done (``df.rdd`` wraps the internal RDD in a
        fresh deserializer — unpersisting that wrapper frees nothing).

        Why not ``.persist()``: the canonical plan reads the canonical
        parquet path (the O-22 anti-join build side), and appending to
        that path triggers ``refreshByPath``, which BOTH drops the cache
        entry AND re-lists the file index — so the subsequent history
        write would recompute the batch against a store that now
        contains the batch's own rows and silently produce zero history
        rows. The checkpoint severs the lineage before any sink write.
        """
        jsc = spark.sparkContext._jsc
        try:
            before = set(jsc.getPersistentRDDs().keySet().toArray())
        except Exception:
            before = None
        frozen = df.localCheckpoint()
        ids: tuple = ()
        if before is not None:
            try:
                ids = tuple(i for i in jsc.getPersistentRDDs().keySet()
                            .toArray() if i not in before)
            except Exception:
                ids = ()
        return frozen, ids

    def _release(ids: tuple) -> None:
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in ids:
                jr = jmap.get(rid)
                if jr is not None:
                    jr.unpersist(False)
        except Exception:
            pass

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        bad = batch.filter(F.col("_corrupt_record").isNotNull())
        good = batch.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
        good = completeness_filter(good)
        if dedup:
            # O-23 within-batch first-wins + O-22 cross-batch anti-join
            # against the canonical store, bounded by the lookback so
            # the id set broadcasts (first batch: no store yet)
            try:
                existing = (
                    spark.read.parquet(canonical_path)
                    .filter(F.col("etl_timestamp")
                            >= F.current_timestamp() - F.expr(f"INTERVAL {lookback}"))
                    .select("entry_id")
                )
                good = idempotent_new_rows(good, F.broadcast(existing))
            except AnalysisException:  # canonical table not created yet
                good = good.dropDuplicates(["entry_id"])
        canonical, frozen_ids = _freeze(
            to_canonical(good, etl_timestamp=etl_timestamp))
        history = to_history(canonical)

        counts["canonical"] += canonical.count()
        counts["history"] += history.count()

        write_partitioned_parquet(canonical, canonical_path,
                                  partition_cols=("primary_category",))
        write_partitioned_parquet(history, f"{out_root}/papers_history",
                                  partition_cols=(), sort_col=None)
        # Quarantine exactly-once: a batch replayed after a crash
        # re-presents the SAME whole files, so anti-joining on the
        # file path drops exactly the already-recorded rows (the
        # canonical/history sinks get the same property from the
        # entry_id anti-join above).
        bad = bad.select("source_path", "_corrupt_record")
        try:
            seen = (spark.read.parquet(quarantine_path)
                    .select("source_path").distinct())
            bad = bad.join(F.broadcast(seen), "source_path", "left_anti")
        except AnalysisException:
            pass  # quarantine table not created yet
        nbad = bad.count()
        counts["quarantine"] += nbad
        if nbad:
            bad.write.mode("append").parquet(quarantine_path)
        _release(frozen_ids)
        if batch_hook is not None:
            batch_hook(epoch_id)

    q = (
        raw.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counts

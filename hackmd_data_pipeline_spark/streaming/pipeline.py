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
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ingest import completeness_filter, idempotent_new_rows, to_canonical, to_history
from ..schemas import RAW_RECORD_SCHEMA
from ..sources.writers import write_partitioned_parquet


def run_ingest_stream(spark: SparkSession, raw_path: str, out_root: str,
                      checkpoint: str, lookback: str = "180 days",
                      dedup: bool = True) -> dict[str, int]:
    """Drain raw jsonl[.gz] into canonical + history Parquet.

    Returns counts per sink. Exactly-once per file via the checkpoint:
    re-running with the same checkpoint ingests nothing new (O-24/O-5'
    idempotency). Cross-batch dedup: when ``dedup`` is set, incoming
    entry_ids are anti-joined against canonical rows whose
    etl_timestamp falls within ``lookback`` — the bounded build side
    broadcasts at scale, exactly the reference's 6-month id-set trick.
    Both properties are asserted in tests/test_ingest_pipeline.py.
    """
    canonical_path = f"{out_root}/papers"
    raw = (
        spark.readStream.schema(RAW_RECORD_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(raw_path)
        # per-file lineage (reference s3_path per row, arxiv_etl.py:85):
        # input_file_name() works on file-source streams; a glob-root
        # literal would collapse every row to the same path
        .withColumn("source_path", F.input_file_name())
    )

    counts = {"canonical": 0, "history": 0, "quarantine": 0}

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
        canonical = to_canonical(good).persist()
        history = to_history(canonical)

        counts["canonical"] += canonical.count()
        counts["history"] += history.count()
        nbad = bad.count()
        counts["quarantine"] += nbad

        write_partitioned_parquet(canonical, canonical_path,
                                  partition_cols=("primary_category",))
        write_partitioned_parquet(history, f"{out_root}/papers_history",
                                  partition_cols=(), sort_col=None)
        if nbad:
            bad.select("source_path", "_corrupt_record").write.mode("append").parquet(
                f"{out_root}/quarantine")
        canonical.unpersist()

    q = (
        raw.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counts

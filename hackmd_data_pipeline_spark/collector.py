"""Collector orchestration (SURVEY.md §3.1, O-1/O-22/O-26/O-30/O-34..O-36).

The reference's collector is a self-invoking Lambda that scans a
rate-limited source per category, dedups against a 6-month id history,
batches records to gzip-JSONL on S3, and tracks per-category progress
and run stats in Postgres (reference src/extract/arxiv_collector.py:
211-330). Spark-first restructuring:

  * the SOURCE stays a driver-side callable (the reference keeps it on
    one client by design for IP-consistency, README.md:61) returning
    plain dicts — swap in a real HTTP client in production;
  * everything after the fetch is DataFrame work: explicit-schema
    createDataFrame, within-batch dropDuplicates (O-23), left-anti
    join against the bounded id history (O-22 — the lookback filter
    keeps the build side broadcastable, the reference's own
    memory-bound trick), partitioned gzip-JSONL write (O-3 layout);
  * category progress / run stats are ControlTable generation flips
    (streaming/control.py) instead of row UPDATEs (O-26/O-30);
  * the self-invoking loop (O-35) is a drain-until-done driver loop:
    each call processes ``categories_per_run`` pending categories and
    reports whether work remains.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import CATEGORY_PROGRESS_SCHEMA, CATEGORY_RUN_STATS_SCHEMA, RAW_RECORD_SCHEMA
from .streaming.control import ControlTable

# records per output file — the reference's batch_size=100
# (config/config.yaml:16) scaled for Parquet-era file sizes
DEFAULT_BATCH_SIZE = 100

FetchFn = Callable[[str, int], Iterable[dict]]


class Collector:
    """Drain-style collector over a pluggable rate-limited source."""

    def __init__(self, spark: SparkSession, root: str, fetch: FetchFn,
                 categories: list[str], categories_per_run: int = 3,
                 max_results: int = 1000, batch_size: int = DEFAULT_BATCH_SIZE,
                 lookback_months: int = 6):
        self.spark = spark
        self.root = root
        self.fetch = fetch
        self.categories = categories
        self.categories_per_run = categories_per_run
        self.max_results = max_results
        self.batch_size = batch_size
        self.lookback_months = lookback_months
        self.progress = ControlTable(spark, f"{root}/category_progress",
                                     CATEGORY_PROGRESS_SCHEMA)
        self.run_stats = ControlTable(spark, f"{root}/category_run_stats",
                                      CATEGORY_RUN_STATS_SCHEMA)

    # -------------------------------------------------------- work selection

    def register_new_categories(self) -> None:
        """O-23c: YAML category list minus categories already tracked
        (reference arxiv_collector.py:217-222) — EXCEPT via left-anti."""
        # Arrow local relation (r12): a python-parallelized
        # createDataFrame embedded in the progress table's generation
        # write makes its coalesce(1) evaluate defaultParallelism
        # pickled slices serially (~5 s per flip on local[32])
        from .session import arrow_local_df

        yaml_df = arrow_local_df(
            self.spark, {"category_name": list(self.categories)},
            "category_name string")
        cur = self.progress.read()
        new = (
            yaml_df.join(cur.select("category_name"), "category_name", "left_anti")
            .select("category_name", F.lit("").alias("status"),
                    F.current_timestamp().alias("updated_at"))
        )
        if new.take(1):
            self.progress.write(cur.unionByName(new))

    def pending_categories(self) -> list[str]:
        """O-17 + O-34: not-Finished categories, first k (reference
        arxiv_collector.py:63-72,87-91)."""
        return [
            r.category_name
            for r in self.progress.read()
            .filter(F.col("status") != "Finished")
            .orderBy("category_name")
            .limit(self.categories_per_run)
            .collect()
        ]

    # ------------------------------------------------------------- dedup side

    def known_ids(self, lookback_months: int | None = None) -> DataFrame:
        """O-19 + O-22 build side: ids ingested within the lookback
        window (reference load_existing_ids, arxiv_collector.py:123-134).
        The time bound keeps this broadcastable at scale."""
        if lookback_months is None:
            lookback_months = self.lookback_months
        try:
            raw = self.spark.read.schema(RAW_RECORD_SCHEMA).json(f"{self.root}/raw")
        except Exception:
            from .session import empty_local_df

            return empty_local_df(self.spark, "entry_id string")
        cutoff = F.current_timestamp() - F.expr(f"INTERVAL {lookback_months} MONTHS")
        return (
            raw.select("entry_id", F.to_timestamp("published").alias("_pub"))
            .filter(F.col("_pub").isNull() | (F.col("_pub") >= cutoff))
            .select("entry_id").distinct()
        )

    # -------------------------------------------------------------- one run

    def run_once(self) -> dict:
        """Process up to categories_per_run categories; returns
        {'processed': [...], 'pending_after': n} — the caller loops
        while pending_after > 0 (O-35, reference arxiv_collector.py:
        196-208,325-330)."""
        self.register_new_categories()
        todo = self.pending_categories()
        stats_rows = []
        for cat in todo:
            t0 = time.monotonic()
            # re-resolve per category: the reference's id set grows as
            # the run proceeds (arxiv_collector.py:260-264), and the
            # file listing behind a DataFrame is fixed at creation
            known = F.broadcast(self.known_ids())
            records = list(self.fetch(cat, self.max_results))
            if records:
                incoming = self.spark.createDataFrame(records, RAW_RECORD_SCHEMA)
            else:
                from .session import empty_local_df

                incoming = empty_local_df(self.spark, RAW_RECORD_SCHEMA)
            fresh = (
                incoming.dropDuplicates(["entry_id"])           # O-23
                .join(known, "entry_id", "left_anti")           # O-22
            )
            n_written = fresh.count()
            if n_written:
                (
                    fresh.withColumn("_cat", F.regexp_replace(F.lit(cat), r"\.", "_"))
                    .withColumn("_ingest_date", F.current_date())
                    .repartition(max(1, n_written // self.batch_size))
                    .write.mode("append")
                    .option("compression", "gzip")
                    .partitionBy("_cat", "_ingest_date")
                    .json(f"{self.root}/raw")
                )
            stats_rows.append((cat, time.monotonic() - t0, n_written, n_written, None))
            self._mark_finished(cat)

        if stats_rows:
            # Arrow local relation — the run_stats generation write
            # coalesces to one file (see register_new_categories)
            from .session import arrow_local_df

            stats = arrow_local_df(
                self.spark,
                {"category_name": [r[0] for r in stats_rows],
                 "time_sec": [float(r[1]) for r in stats_rows],
                 "s3_count": [int(r[2]) for r in stats_rows],
                 "pg_count": [int(r[3]) for r in stats_rows]},
                "category_name string, time_sec double, "
                "s3_count int, pg_count int",
            ).withColumn("updated_at", F.current_timestamp())
            self.run_stats.write(self.run_stats.read().unionByName(stats))

        pending_after = (
            self.progress.read().filter(F.col("status") != "Finished").count())
        return {"processed": todo, "pending_after": pending_after}

    def drain(self, max_runs: int = 100) -> int:
        """O-35 loop: run until no pending categories. Returns runs."""
        for i in range(max_runs):
            if self.run_once()["pending_after"] == 0:
                return i + 1
        return max_runs

    def _mark_finished(self, category: str) -> None:
        """O-26 (reference arxiv_collector.py:93-100)."""
        cur = self.progress.read()
        hit = F.col("category_name") == category
        self.progress.write(
            cur.withColumn("status", F.when(hit, "Finished").otherwise(F.col("status")))
            .withColumn("updated_at",
                        F.when(hit, F.current_timestamp()).otherwise(F.col("updated_at")))
        )

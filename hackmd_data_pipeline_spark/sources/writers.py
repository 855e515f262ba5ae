"""Partitioned sinks (SURVEY.md §2.A, O-3 + §1.4).

The reference lands gzip-JSONL under ``raw/{category}/{date}/…``
(reference arxiv_collector.py:163-194, key layout :175) and relies on
Postgres B-tree/GIN indexes for selective access
(create_table.sql:76-81). Spark-first storage layout:

  * raw wire format: ``partitionBy(category, ingest_date)`` JSON+gzip
    — the reference's S3 key scheme becomes real partition pruning.
  * canonical store: Parquet + zstd, same partition columns, sorted
    within partitions on the date column so Parquet min/max row-group
    stats substitute for the B-tree index.
  * ``maxRecordsPerFile`` bounds file size (the reference's
    batch_size=100 chunking, config.yaml:16, scaled up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_json(df: DataFrame, path: str,
                           partition_cols: tuple[str, ...] = ("category", "ingest_date"),
                           max_records_per_file: int = 100_000) -> None:
    """Raw-zone sink: gzip JSONL, hive-partitioned (O-3)."""
    (
        df.write.mode("append")
        .option("compression", "gzip")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .json(path)
    )


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_cols: tuple[str, ...] = ("primary_category",),
                              sort_col: str | None = "published_date",
                              max_records_per_file: int = 1_000_000,
                              mode: str = "append",
                              extra_options: dict | None = None) -> None:
    """Canonical-zone sink: Parquet+zstd, partition-pruned by category,
    row-group-skippable by date (the index substitute, SURVEY.md §1.4).
    ``extra_options`` passes writer options through (e.g. a smaller
    ``parquet.block.size`` — row-group granularity is the skipping
    granularity, tested in tests/test_ingest_pipeline.py)."""
    out = df
    if sort_col is not None:
        # sort by (partition cols, sort col): a partitionBy write that
        # receives data NOT ordered by its partition expressions
        # re-sorts each task on those expressions alone — which would
        # silently destroy a bare sortWithinPartitions(sort_col) order.
        # Leading with the partition cols satisfies the writer's
        # required ordering, so the date order survives into the row
        # groups (asserted on parquet stats in tests)
        out = out.sortWithinPartitions(*partition_cols, sort_col)
    w = (out.write.mode(mode)
         .option("compression", "zstd")
         .option("maxRecordsPerFile", max_records_per_file))
    for k, v in (extra_options or {}).items():
        w = w.option(k, v)
    w.partitionBy(*partition_cols).parquet(path)

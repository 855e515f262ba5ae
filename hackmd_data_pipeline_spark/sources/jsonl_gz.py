"""gzip-JSONL raw-record source (SURVEY.md §2.A, O-4 + O-28).

The reference streams gz objects line-by-line with json.loads per line
(reference src/etl/arxiv_etl.py:138-155) and salvages bad batches
row-by-row (arxiv_etl.py:113-124). Spark-first translation:

  * ``spark.read.json`` with the explicit RAW_RECORD_SCHEMA (never
    inference), gzip decoded by codec — one task per .gz file since
    gzip is non-splittable. Fine for the reference's ~100-record
    files; at 100 TB the canonical store is Parquet+zstd (writers.py)
    and gz stays an ingest wire format only, with
    ``maxPartitionBytes``-style small-file coalescing via the
    built-in file-source packing.
  * PERMISSIVE mode + ``_corrupt_record`` replaces row-by-row
    salvage: malformed lines land in a quarantine DataFrame instead
    of aborting the batch — same dead-letter semantics, zero retry
    loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import RAW_RECORD_SCHEMA


def read_raw_jsonl(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read raw jsonl[.gz] with explicit schema + corrupt-record capture
    and per-file lineage (reference keeps s3_path per row,
    arxiv_etl.py:85)."""
    return (
        spark.read.schema(RAW_RECORD_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumn("source_path", F.input_file_name())
    )


def split_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — O-28 dead-letter split.

    A row is quarantined if JSON parsing failed (corrupt record
    captured) — the good side drops the capture column. The input is
    cached first: Spark forbids queries that project only the corrupt
    column straight off a JSON scan (it would otherwise re-parse).
    """
    raw = raw.cache()
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "source_path", "_corrupt_record")
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad

"""Delimited-text (CSV/TSV) source with the same dead-letter contract
as the gzip-JSONL source (SURVEY.md §2.A O-4/O-28 family).

The reference's only wire format is gzip-JSONL, but its salvage
semantics (row-by-row recovery of a bad batch, reference
src/etl/arxiv_etl.py:113-124) are format-independent — this module
extends them to delimited text so the engine covers the other raw
format a 100 TB ingest actually meets. Same rules as JSONL:

  * explicit schema always (inference would both scan twice and make
    oracle comparisons nondeterministic);
  * PERMISSIVE + ``_corrupt_record`` — malformed lines are data, not
    exceptions;
  * per-file lineage via ``input_file_name()``;
  * compression by codec (``.csv.gz`` works, non-splittable like any
    gzip — acceptable for ingest-sized files only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_delimited(spark: SparkSession, path: str | list[str],
                   schema: T.StructType, sep: str = ",",
                   header: bool = True) -> DataFrame:
    """Read delimited text with explicit schema + corrupt-row capture.

    The caller's ``schema`` must NOT include ``_corrupt_record``; it is
    appended here so the PERMISSIVE reader has a capture column.
    """
    capture = schema.add("_corrupt_record", T.StringType())
    return (
        spark.read.schema(capture)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("enforceSchema", "true")
        .csv(path)
        .withColumn("source_path", F.input_file_name())
    )


def split_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — identical contract to the JSONL source."""
    raw = raw.cache()
    bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "source_path", "_corrupt_record")
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, bad

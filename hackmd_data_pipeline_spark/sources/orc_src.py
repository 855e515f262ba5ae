"""ORC source/sink — the second columnar format (SURVEY.md §2.A
source-family extension).

The canonical store is Parquet (sources/writers.py), but a 100 TB
lake rarely gets to choose its inputs: ORC is the other columnar
format Spark reads natively (predicate pushdown, column pruning, and
partition discovery all work through the same DataSource V2 path), so
the engine accepts it as a first-class relational source without any
conversion step. Same contracts as every other source here:

  * explicit schema always — inference scans twice and can drift
    between files;
  * schema RECONCILED per file by name (ORC stores column names), so
    column reordering across producers is safe;
  * zstd on write, ``maxRecordsPerFile`` chunking (O-36) honored.

The reference pipeline has no ORC surface (its wire format is
gzip-JSONL, reference src/extract/arxiv_collector.py:146-175); this
module exists for lake interop, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_orc(spark: SparkSession, path: str | list[str],
             schema: T.StructType, with_lineage: bool = False) -> DataFrame:
    """Read ORC with an explicit schema (pruned to ``schema``'s
    columns — the scan reads only those stripes' streams).

    ``with_lineage`` appends ``source_path`` via ``input_file_name()``
    like the raw-zone readers; off by default because lineage defeats
    some scan-level optimizations on columnar sources."""
    df = spark.read.schema(schema).orc(path)
    if with_lineage:
        df = df.withColumn("source_path", F.input_file_name())
    return df


def write_orc(df: DataFrame, path: str, mode: str = "error",
              partition_by: list[str] | None = None,
              max_records_per_file: int | None = None) -> None:
    """Write ORC with zstd compression and optional partition layout +
    file chunking — mirror of the Parquet writer's knobs."""
    w = df.write.mode(mode).option("compression", "zstd")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)

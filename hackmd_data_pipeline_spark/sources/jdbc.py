"""JDBC relational edge (O-5/O-6 parity, behind a flag).

The reference moves rows in and out of Postgres with psycopg2: batched
multi-row INSERT ... ON CONFLICT DO NOTHING (reference
src/core/pg_engine.py:102-122, ``insert_mogrify``) and cursor reads
(pg_engine.py:80-100). Spark's native counterpart is the JDBC data
source — these wrappers pin the options that matter at scale:

  * read: ``partitionColumn/lowerBound/upperBound/numPartitions`` so
    the scan is N parallel range queries, not one cursor; ``fetchsize``
    so each executor streams rows instead of buffering the result set.
  * write: ``batchsize`` (the JDBC analog of the reference's
    execute_values batching), ``isolationLevel`` READ_COMMITTED,
    ``truncate`` to keep overwrite from dropping indexes.

Conflict-ignore (the reference's ON CONFLICT DO NOTHING) is NOT a
JDBC-write option: the engine's idempotent path stays
plans/ingest.idempotent_new_rows (anti-join before append), which is
also how it works on the parquet store — see streaming/pipeline.py.

Tested live in-container against Derby embedded (the JDBC database
Spark itself ships for the Hive metastore — org.apache.derby.jdbc.
EmbeddedDriver is on every session's classpath), covering the banded
parallel read, batched append, and truncate-overwrite paths
(tests/test_jdbc.py). The Postgres round-trip additionally runs when
SPARK_GRAFT_JDBC_URL points at a live server.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              num_partitions: int = 8,
              fetchsize: int = 10_000,
              **options: str) -> DataFrame:
    """Parallel JDBC range scan.

    With ``partition_column`` + bounds the read issues
    ``num_partitions`` WHERE-banded queries in parallel — the only
    JDBC read shape that scales; without them Spark uses ONE
    connection, which is only acceptable for dimension-sized tables.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("fetchsize", str(fetchsize)))
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "append", batchsize: int = 1_000,
               truncate: bool = True, **options: str) -> None:
    """Batched JDBC write — ``batchsize`` rows per round-trip, the
    JDBC analog of the reference's execute_values multi-row INSERT
    (pg_engine.py:102-122). ``mode='overwrite'`` with ``truncate``
    TRUNCATEs instead of DROP+CREATE so indexes and grants survive."""
    writer = (df.write.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batchsize))
              .option("isolationLevel", "READ_COMMITTED")
              .option("truncate", "true" if truncate else "false")
              .mode(mode))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()

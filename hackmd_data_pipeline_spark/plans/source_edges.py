"""Driver-gated wire-format parity queries (r06 VERDICT item 5).

The engine claims three transports beyond the canonical parquet lake —
JDBC (sources/jdbc.py, the reference's psycopg2 edge restated,
reference src/core/pg_engine.py:79-122), delimited text
(sources/csv_src.py, the salvage contract of the gzip-JSONL edge,
reference src/etl/arxiv_etl.py:138-155, applied to the other raw
format), and ORC (sources/orc_src.py, lake interop) — but until r07
they were pytest-only: no CORRECTNESS_r*.json row ever value-checked
data THROUGH them. These queries close that: each round-trips a
driver table through the wire format (write with the engine's sink,
read back with the engine's source) and aggregates the READ-BACK rows,
while the DuckDB oracle computes the same aggregate from the parquet
view directly — so a hash match proves the transport is lossless
end-to-end (types, strings, doubles, dates), not merely that the
reader runs.

Round-trip staging lives at per-(sf_dir, mtime, pid) temp paths,
rewritten per invocation and removed at process exit — bounded disk,
no stale reuse, and no cross-process Derby double-boot (see
_edge_path).

Aggregate design: counts and integer sums are exact; doubles are only
MIN/MAX-ed (order-independent, bit-exact through every format) — a
float SUM would hash on reduction order, not on transport fidelity.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.csv_src import read_delimited
from ..sources.jdbc import read_jdbc, write_jdbc
from ..sources.orc_src import read_orc, write_orc
from ..tables import load_table
from .registry import query

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _edge_path(sf_dir: str, table: str, fmt: str) -> str:
    """Staging path for one (dataset, table, format): keyed by
    resolved path + source mtime so a regenerated dataset never
    collides with stale staging, AND by pid — Derby embedded forbids
    two processes booting one database (a concurrent test suite +
    bench run would hard-fail the boot), and concurrent overwrites of
    one CSV/ORC dir race. One staging dir per live process, removed at
    exit, so repeated runs stay bounded on disk (r06 ADVICE posture)."""
    src = os.path.join(os.path.realpath(sf_dir), f"{table}.parquet")
    try:
        mtime = str(int(os.path.getmtime(src)))
    except OSError:
        mtime = "0"
    key = hashlib.md5(f"{src}|{mtime}".encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(),
                        f"graft_edge_{fmt}_{key}_{os.getpid()}")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


@query(
    "src_jdbc_supplier_agg",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(s_suppkey) AS BIGINT) AS sum_suppkey,
           MIN(s_acctbal) AS min_acctbal,
           MAX(s_acctbal) AS max_acctbal,
           MIN(s_name) AS first_name
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def src_jdbc_supplier_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational-edge parity (reference pg_engine.py:79-122): push
    supplier into Derby embedded with the batched JDBC sink
    (truncate-overwrite, the reference's execute_values shape), pull
    it back with the BANDED parallel read (4 WHERE-partitioned range
    scans on s_suppkey — the only JDBC read shape that scales), and
    aggregate the read-back rows per nation. The oracle aggregates the
    parquet view directly, so the hash match certifies the JDBC
    transport end-to-end: BIGINT/INT/DOUBLE/VARCHAR all survive the
    round-trip bit-exactly (createTableColumnTypes pins s_name to
    VARCHAR — Derby's default StringType mapping is CLOB, which cannot
    be aggregated).

    The bounds collect is a 1-row control read (the whitelisted
    pattern); at 100 TB the band count scales with numPartitions while
    each executor streams via fetchsize."""
    sup = load_table(spark, sf_dir, "supplier")
    url = f"jdbc:derby:{_edge_path(sf_dir, 'supplier', 'jdbc')}/db;create=true"
    write_jdbc(sup, url, "graft_supplier", mode="overwrite",
               driver=_DERBY_DRIVER,
               createTableColumnTypes="s_name VARCHAR(64)")
    lo, hi = sup.agg(F.min("s_suppkey"), F.max("s_suppkey")).first()
    back = read_jdbc(spark, url, "graft_supplier",
                     partition_column="s_suppkey",
                     lower_bound=int(lo), upper_bound=int(hi) + 1,
                     num_partitions=4, driver=_DERBY_DRIVER)
    return (
        back.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"),
             F.sum("s_suppkey").alias("sum_suppkey"),
             F.min("s_acctbal").alias("min_acctbal"),
             F.max("s_acctbal").alias("max_acctbal"),
             F.min("s_name").alias("first_name"))
        .orderBy("s_nationkey")
    )


@query(
    "src_csv_orders_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN(CAST(o_orderdate AS DATE)) AS first_date,
           MAX(CAST(o_orderdate AS DATE)) AS last_date
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def src_csv_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited-text parity (the reference's row-salvage raw edge,
    arxiv_etl.py:138-155, on the other wire format): land orders as
    CSV with header, read it back through read_delimited's
    PERMISSIVE + _corrupt_record contract with an EXPLICIT schema
    (inference would scan twice and drift), and aggregate the
    read-back rows per status against the parquet-view oracle. Proves
    the text round-trip is lossless for BIGINT, shortest-repr DOUBLE
    (Spark writes doubles so they re-parse bit-identically), DATE, and
    quoted strings. o_orderdate travels as DATE — a deliberate cast on
    BOTH engines: an NTZ-timestamp-in-text round-trip would hinge on
    session-timezone formatting, which the hostile-tz probe forbids.

    Plain CSV (no gzip) so the read stays splittable — the .csv.gz
    codec path is pytest-covered; at scale gzip is for ingest-sized
    files only (csv_src.py module doc)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority")
    dest = _edge_path(sf_dir, "orders", "csv")
    orders.write.mode("overwrite").option("header", "true").csv(dest)
    schema = T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.DateType()),
        T.StructField("o_orderpriority", T.StringType()),
    ])
    back = read_delimited(spark, dest, schema)
    return (
        back.filter(F.col("_corrupt_record").isNull())
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("o_orderkey").alias("sum_orderkey"),
             F.min("o_totalprice").alias("min_price"),
             F.max("o_totalprice").alias("max_price"),
             F.min("o_orderdate").alias("first_date"),
             F.max("o_orderdate").alias("last_date"))
        .orderBy("o_orderstatus")
    )


@query(
    "src_orc_part_agg",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM(p_size) AS BIGINT) AS sum_size,
           MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def src_orc_part_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-interop parity: land part as zstd ORC through the
    engine's sink, read it back through read_orc with an explicit
    PRUNED schema (only the aggregated columns — the scan reads just
    those stripes' streams, same DataSource V2 pushdown path as
    parquet), and aggregate per brand against the parquet-view oracle.
    Certifies the second columnar format carries BIGINT/INT/DOUBLE/
    VARCHAR bit-exactly. The reference has no ORC surface (gzip-JSONL
    only, arxiv_collector.py:146-175); this is the lake-interop edge a
    100 TB deployment cannot choose to not have."""
    part = load_table(spark, sf_dir, "part")
    dest = _edge_path(sf_dir, "part", "orc")
    write_orc(part, dest, mode="overwrite")
    schema = T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ])
    back = read_orc(spark, dest, schema)
    return (
        back.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"),
             F.sum("p_size").alias("sum_size"),
             F.min("p_retailprice").alias("min_price"),
             F.max("p_retailprice").alias("max_price"))
        .orderBy("p_brand")
    )

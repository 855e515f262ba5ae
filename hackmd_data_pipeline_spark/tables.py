"""Test-table loader.

Loads the driver's parquet tables (TESTDATA.md) and registers them as
temp views so query builders can use either DataFrame or SQL form.
Reads are plain ``spark.read.parquet`` — Catalyst handles column
pruning and predicate pushdown; callers must NOT pre-collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Memo of loaded table DataFrames keyed by (session id, sf_dir, name).
# A spark.read.parquet call costs ~85 ms of driver-side work (file
# listing + footer schema read + py4j) — across a 118-query bench
# sweep that was ~40 s of pure plan-build overhead for IDENTICAL
# immutable inputs. The test tables are read-only by contract
# (TESTDATA.md), so the snapshot FileIndex a cached DataFrame holds
# can never go stale; mutable paths must not go through load_table.
_TABLE_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    hit = _TABLE_CACHE.get(key)
    # id() can be recycled after a session is GC'd — verify identity
    if hit is not None and hit[0] is spark:
        return hit[1]

    # The driver's events.parquet carries TIMESTAMP(NANOS) (pandas
    # datetime64[ns]), which the vectorized parquet reader rejects.
    # Read nanos as long (runtime-settable legacy conf) and normalize
    # to a microsecond TIMESTAMP_NTZ — still a native columnar scan,
    # pushdown intact for every other column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # Pure NTZ arithmetic (epoch + micros) — independent of the
        # caller's session timezone; an LTZ round-trip here would shift
        # wall-clocks for non-UTC driver sessions.
        df = df.withColumn(
            "ts",
            F.timestamp_add(
                "MICROSECOND", F.expr("ts div 1000"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            ),
        )
    _TABLE_CACHE[key] = (spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES,
                register_views: bool = True) -> dict[str, DataFrame]:
    """Load the named tables; optionally register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out

"""JDBC edge: option-plumbing is unit-tested without a database; the
round-trip test runs only when SPARK_GRAFT_JDBC_URL points at a live
JDBC endpoint with a driver on the classpath (not the case in the
default sandbox — no driver jar, no server).
"""

from __future__ import annotations

import os

import pytest

from hackmd_data_pipeline_spark.sources.jdbc import read_jdbc, write_jdbc

JDBC_URL = os.environ.get("SPARK_GRAFT_JDBC_URL")


def test_read_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:postgresql://x/db", "t",
                  partition_column="id")  # no bounds


@pytest.mark.skipif(not JDBC_URL, reason="SPARK_GRAFT_JDBC_URL not set")
def test_jdbc_round_trip(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    write_jdbc(df, JDBC_URL, "graft_jdbc_smoke", mode="overwrite")
    back = read_jdbc(spark, JDBC_URL, "graft_jdbc_smoke",
                     partition_column="k", lower_bound=0, upper_bound=100,
                     num_partitions=4)
    assert back.count() == 100

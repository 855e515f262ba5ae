"""JDBC edge: a LIVE round-trip against Derby embedded (the database
Spark ships in its own jars for the Hive metastore — no install, no
server), plus the env-gated Postgres round-trip for deployments that
set SPARK_GRAFT_JDBC_URL. Closes the r05 verdict residual "the JDBC
edge has never actually round-tripped in-container".
"""

from __future__ import annotations

import os

import pytest

from hackmd_data_pipeline_spark.sources.jdbc import read_jdbc, write_jdbc

JDBC_URL = os.environ.get("SPARK_GRAFT_JDBC_URL")

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def test_read_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:postgresql://x/db", "t",
                  partition_column="id")  # no bounds


def test_jdbc_round_trip_derby_embedded(spark, tmp_path):
    """The full relational-edge contract against a real JDBC engine:
    banded parallel read (4 WHERE-partitioned scans), batched append
    (the reference pg_engine.py:102-122 insert shape), and
    truncate-overwrite (table survives, rows replaced)."""
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    df = spark.range(0, 100).withColumnRenamed("id", "k")

    write_jdbc(df, url, "graft_jdbc_smoke", mode="overwrite",
               driver=_DERBY_DRIVER)
    back = read_jdbc(spark, url, "graft_jdbc_smoke",
                     partition_column="k", lower_bound=0, upper_bound=100,
                     num_partitions=4, driver=_DERBY_DRIVER)
    assert back.rdd.getNumPartitions() == 4  # banded scan, not 1 cursor
    assert sorted(r.k for r in back.collect()) == list(range(100))

    write_jdbc(spark.range(100, 150).withColumnRenamed("id", "k"), url,
               "graft_jdbc_smoke", mode="append", driver=_DERBY_DRIVER)
    assert read_jdbc(spark, url, "graft_jdbc_smoke",
                     driver=_DERBY_DRIVER).count() == 150

    write_jdbc(df, url, "graft_jdbc_smoke", mode="overwrite",
               driver=_DERBY_DRIVER)
    assert read_jdbc(spark, url, "graft_jdbc_smoke",
                     driver=_DERBY_DRIVER).count() == 100


def test_jdbc_banded_read_pushes_filters(spark, tmp_path):
    """A filter on a banded JDBC read must reach the REMOTE engine as
    a WHERE clause (PushedFilters in the scan node), not run as a
    post-scan Spark filter — at 100 TB the difference is shipping the
    predicate vs shipping the table (r06 VERDICT item 5)."""
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    write_jdbc(spark.range(0, 100).withColumnRenamed("id", "k"), url,
               "graft_jdbc_push", mode="overwrite", driver=_DERBY_DRIVER)
    back = read_jdbc(spark, url, "graft_jdbc_push",
                     partition_column="k", lower_bound=0, upper_bound=100,
                     num_partitions=4, driver=_DERBY_DRIVER)
    filtered = back.filter("k >= 90")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,90)" in plan, (
        f"k >= 90 not pushed to the JDBC source:\n{plan}")
    assert filtered.count() == 10


@pytest.mark.skipif(not JDBC_URL, reason="SPARK_GRAFT_JDBC_URL not set")
def test_jdbc_round_trip(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    write_jdbc(df, JDBC_URL, "graft_jdbc_smoke", mode="overwrite")
    back = read_jdbc(spark, JDBC_URL, "graft_jdbc_smoke",
                     partition_column="k", lower_bound=0, upper_bound=100,
                     num_partitions=4)
    assert back.count() == 100

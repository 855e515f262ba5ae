"""sources/orc_src.py — ORC roundtrip, schema pruning/pushdown,
partition layout, and chunking."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hackmd_data_pipeline_spark.sources.orc_src import read_orc, write_orc

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("cat", T.StringType()),
    T.StructField("val", T.DoubleType()),
])

ROWS = [(i, "ab"[i % 2], i * 1.5) for i in range(100)]


def test_roundtrip_and_column_pruning(spark, tmp_path):
    src = spark.createDataFrame(ROWS, SCHEMA)
    write_orc(src, str(tmp_path / "t"))
    back = read_orc(spark, str(tmp_path / "t"), SCHEMA)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)

    # explicit narrow schema prunes the scan to the requested columns
    narrow = T.StructType([T.StructField("id", T.LongType())])
    plan = read_orc(spark, str(tmp_path / "t"), narrow)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "val" not in plan and "ReadSchema" in plan


def test_predicate_pushdown_reaches_scan(spark, tmp_path):
    write_orc(spark.createDataFrame(ROWS, SCHEMA), str(tmp_path / "t"))
    q = read_orc(spark, str(tmp_path / "t"), SCHEMA).filter(F.col("id") > 90)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan
    assert q.count() == 9


def test_partition_layout_and_chunking(spark, tmp_path):
    write_orc(spark.createDataFrame(ROWS, SCHEMA).repartition(1),
              str(tmp_path / "p"), partition_by=["cat"],
              max_records_per_file=20)
    files_a = glob.glob(str(tmp_path / "p" / "cat=a" / "*.orc"))
    assert len(files_a) >= 3  # 50 rows / 20-per-file chunking
    back = read_orc(spark, str(tmp_path / "p"),
                    T.StructType([f for f in SCHEMA if f.name != "cat"]))
    # partition column recovered from the directory layout
    assert back.count() == 100

    # partition pruning: the directory filter never reads cat=b files
    pruned = (spark.read.schema(SCHEMA).orc(str(tmp_path / "p"))
              .filter(F.col("cat") == "a"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 50
    assert "PartitionFilters: [" in plan and "cat" in plan


def test_lineage_column(spark, tmp_path):
    write_orc(spark.createDataFrame(ROWS, SCHEMA), str(tmp_path / "t"))
    back = read_orc(spark, str(tmp_path / "t"), SCHEMA, with_lineage=True)
    row = back.head()
    assert row["source_path"].endswith(".orc")

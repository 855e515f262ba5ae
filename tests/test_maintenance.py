"""Maintenance operators: compaction file-count math and dense stable
global id assignment.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.maintenance import (
    assign_global_ids, compact, table_file_stats)
from hackmd_data_pipeline_spark.tables import load_table

from .conftest import SF_CORRECT


def test_compact_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    li = load_table(spark, SF_CORRECT, "lineitem")
    li.repartition(40).write.parquet(src)   # simulate small-file ingest
    assert table_file_stats(spark, src)["n_files"] == 40

    total = table_file_stats(spark, src)["total_bytes"]
    result = compact(spark, src, target_file_bytes=total // 4 + 1,
                     dest=str(tmp_path / "compacted"))
    assert result["after"]["n_files"] <= 4
    # lossless: same rows after compaction
    assert (spark.read.parquet(result["dest"]).count() == li.count())


def test_assign_global_ids_dense_and_stable(spark):
    d = load_table(spark, SF_CORRECT, "documents").repartition(7)
    n = d.count()
    ids1 = assign_global_ids(d)
    got = [r.global_id for r in ids1.select("global_id").collect()]
    assert sorted(got) == list(range(n))          # dense 0..n-1, unique
    # stable: same ids for same rows across two materializations
    a = {(r.doc_id): r.global_id for r in ids1.collect()}
    b = {(r.doc_id): r.global_id
         for r in assign_global_ids(d).collect()}
    assert a == b
    # schema passthrough + appended column
    assert ids1.columns == d.columns + ["global_id"]


def test_retention_sweep_drops_old_partitions(spark, tmp_path):
    """Partition-scoped retention DELETE: values below the cutoff are
    removed wholesale, newer partitions stay byte-identical, re-runs
    are idempotent, and foreign directories are untouched."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.operators.maintenance import retention_sweep

    dest = str(tmp_path / "rollup")
    rows = [(d, i, float(i)) for i, d in enumerate(
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"])]
    (spark.createDataFrame(rows, ["d", "k", "v"])
     .withColumn("d", F.col("d").cast("date"))
     .write.partitionBy("d").parquet(dest))

    out = retention_sweep(spark, dest, "d", keep_from="2024-01-03")
    assert out["dropped"] == ["2024-01-01", "2024-01-02"]
    assert out["kept"] == ["2024-01-03", "2024-01-04"]

    kept = spark.read.parquet(dest)
    assert sorted(r.k for r in kept.collect()) == [2, 3]

    again = retention_sweep(spark, dest, "d", keep_from="2024-01-03")
    assert again["dropped"] == [] and again["kept"] == out["kept"]


def test_retention_sweep_unescapes_and_skips_null_partition(spark, tmp_path):
    """Hive-escaped partition values (timestamps carry %3A) compare in
    UNESCAPED form, and __HIVE_DEFAULT_PARTITION__ (NULL) is never
    dropped by a value cutoff — reported under 'skipped' (round-3
    ADVICE)."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.operators.maintenance import (
        retention_sweep,
    )

    dest = str(tmp_path / "ts_rollup")
    rows = [("2024-01-01 08:00:00", 0, 0.0),
            ("2024-01-02 09:30:00", 1, 1.0),
            ("2024-01-03 10:45:00", 2, 2.0),
            (None, 3, 3.0)]
    (spark.createDataFrame(rows, ["ts", "k", "v"])
     .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
     .write.partitionBy("ts").parquet(dest))

    out = retention_sweep(spark, dest, "ts",
                          keep_from="2024-01-02 00:00:00")
    assert out["dropped"] == ["2024-01-01 08:00:00"]
    assert out["kept"] == ["2024-01-02 09:30:00", "2024-01-03 10:45:00"]
    assert out["skipped"] == ["__HIVE_DEFAULT_PARTITION__"]
    kept = spark.read.parquet(dest)
    assert sorted(r.k for r in kept.collect()) == [1, 2, 3]

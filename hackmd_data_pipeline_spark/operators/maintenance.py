"""Table-maintenance operators: small-file compaction and stable
global id assignment.

Small files are the silent killer of a 100 TB lake: a micro-batched
ingest (the reference writes ~100-record gz objects, reference
config/config.yaml:16) leaves millions of tiny files whose per-file
open/footer cost dominates scans. Compaction rewrites a table's files
to a target size — metadata-driven (file listing), no shuffle beyond
the coalesce.

Global ids: training pipelines need a dense, stable ``0..n-1``
numbering (shard assignment, shuffling, sampling). A naive
``monotonically_increasing_id`` is neither dense nor stable;
``zipWithIndex`` forces an RDD round-trip. The two-pass DataFrame
form below counts rows per partition, prefix-sums the offsets on the
driver (one tiny collect of num-partitions longs), and adds the
offset to a per-partition row number — one extra job, no shuffle.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_file_stats(spark: SparkSession, path: str) -> dict:
    """File count / total bytes / mean file size of a parquet table."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        sizes.extend(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return {"n_files": len(sizes), "total_bytes": sum(sizes),
            "mean_bytes": (sum(sizes) // len(sizes)) if sizes else 0}


def compact(spark: SparkSession, path: str, target_file_bytes: int = 128 << 20,
            dest: str | None = None) -> dict:
    """Rewrite ``path``'s parquet files at ~``target_file_bytes`` each.

    In-place compaction is not atomic on a plain filesystem, so the
    default writes to ``dest`` (caller swaps directories/pointers —
    the same generation-flip the control tables use). The file count
    is computed from actual on-disk bytes, not row estimates, and the
    rewrite uses coalesce (no shuffle) since compaction only merges.

    Returns before/after file stats.
    """
    before = table_file_stats(spark, path)
    n_files = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    out = dest or (path.rstrip("/") + "_compacted")
    df = spark.read.parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out)
    return {"before": before, "after": table_file_stats(spark, out),
            "dest": out}


def assign_global_ids(df: DataFrame, id_name: str = "global_id") -> DataFrame:
    """Dense, gap-free ``0..n-1`` ids in partition-then-row order.

    Pass 1 counts rows per partition (cheap agg on
    spark_partition_id); the prefix-sum offsets — one long per
    partition — broadcast back implicitly via the join on partition
    id. No global sort, no single-partition window (the
    row_number-over-empty-window trap that serializes the whole
    dataset through one task).
    """
    counts = sorted(
        (r._pid, r.n) for r in
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").agg(F.count("*").alias("n")).collect())
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n

    def add_ids(iterator):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        next_id = offsets.get(pid, 0)
        for pdf in iterator:
            pdf = pdf.copy()
            pdf[id_name] = range(next_id, next_id + len(pdf))
            next_id += len(pdf)
            yield pdf

    # pass 2 is pure mapInPandas on the SAME partitioning (partition
    # ids are stable for a deterministic source plan), so the id
    # assignment itself incurs zero shuffle. (Fresh StructType — .add
    # on df.schema would mutate the DataFrame's cached schema object.)
    from pyspark.sql import types as T
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_name, T.LongType())])
    return df.mapInPandas(add_ids, out_schema)


def retention_sweep(spark: SparkSession, path: str, partition_col: str,
                    keep_from: str) -> dict:
    """Retention enforcement for a value-partitioned table: drop every
    ``{partition_col}={value}`` directory whose value sorts below
    ``keep_from`` (ISO dates compare lexicographically, so a date
    cutoff is just a string). The complement of refresh_rollup's
    partition-scoped REWRITE — this is the partition-scoped DELETE,
    and together they give the hypertable-style lifecycle
    (reference's managed Postgres tables age out rows with DELETEs;
    a lakehouse table ages out whole partitions).

    Scale posture: purely metadata-driven — list immediate partition
    dirs, delete whole directories via the scheme-aware Hadoop
    FileSystem API (sources/fs.py; pathlib would silently no-op on
    hdfs:// and s3a://). Cost is O(partitions dropped), zero data
    read, no job launched. Each directory delete is atomic on
    HDFS/POSIX; on S3A a failed sweep re-run is idempotent (already-
    deleted partitions are simply absent).

    Directory names carry Hive's URL-style escaping (a timestamp
    partition is ``ts=2024-01-01 00%3A00%3A00``; a NULL partition is
    ``__HIVE_DEFAULT_PARTITION__``), so values are UNESCAPED before
    comparing — comparing the escaped form mis-buckets any value whose
    escape sequences sort differently from their characters (round-3
    ADVICE). NULL partitions are never dropped by a value cutoff; they
    are reported under ``skipped`` for the caller to decide.

    Returns {"dropped": [...], "kept": [...], "skipped": [...]}
    (unescaped) partition values.
    """
    import urllib.parse

    from ..sources.fs import fs_delete, fs_list_dirs

    prefix = f"{partition_col}="
    dropped, kept, skipped = [], [], []
    for name in fs_list_dirs(spark, path):
        if not name.startswith(prefix):
            continue
        raw = name[len(prefix):]
        if raw == "__HIVE_DEFAULT_PARTITION__":
            skipped.append(raw)
            continue
        value = urllib.parse.unquote(raw)
        if value < keep_from:
            fs_delete(spark, f"{path.rstrip('/')}/{name}")
            dropped.append(value)
        else:
            kept.append(value)
    return {"dropped": sorted(dropped), "kept": sorted(kept),
            "skipped": sorted(skipped)}

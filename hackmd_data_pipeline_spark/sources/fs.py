"""Hadoop-FileSystem helpers for driver-side path checks.

Driver code must NOT use ``pathlib``/``os.path`` for data paths: those
only work for ``file:`` URIs, silently returning False for ``hdfs://``
/ ``s3a://`` — on a real cluster a bootstrap check that always fails
would silently skip dedup against the persisted store (round-2 ADVICE,
streaming/neardup.py). These helpers resolve the path against the
session's Hadoop configuration, so the scheme decides the filesystem
exactly as it does for reads/writes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its OWN filesystem (scheme-aware)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` if present; True iff it existed."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, True))

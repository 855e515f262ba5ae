"""SCD2 merge semantics: versioning, close-out, idempotent no-ops,
point-in-time snapshots.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hackmd_data_pipeline_spark.operators.scd import scd2_merge, snapshot_at

SCHEMA = T.StructType([
    T.StructField("entry_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("version_note", T.StringType()),
    T.StructField("valid_from", T.TimestampType()),
    T.StructField("valid_to", T.TimestampType()),
])
UPD_SCHEMA = T.StructType([
    T.StructField("entry_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("version_note", T.StringType()),
    T.StructField("effective_ts", T.TimestampType()),
])

T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 2, 1)
T3 = dt.datetime(2024, 3, 1)


def _merge(spark, table_rows, upd_rows):
    table = spark.createDataFrame(table_rows, SCHEMA)
    upd = spark.createDataFrame(upd_rows, UPD_SCHEMA)
    return scd2_merge(table, upd, ["entry_id"],
                      ["title", "version_note"]).collect()


def test_scd2_update_insert_noop(spark):
    table_rows = [
        ("a", "A v1", "n1", T1, None),
        ("b", "B v1", "n1", T1, None),
    ]
    upd_rows = [
        ("a", "A v2", "n2", T2, ),      # changed -> close + new version
        ("b", "B v1", "n1", T2, ),      # identical -> no-op
        ("c", "C v1", "n1", T2, ),      # brand new key -> insert
    ]
    rows = _merge(spark, table_rows, upd_rows)
    by = {}
    for r in rows:
        by.setdefault(r.entry_id, []).append(r)
    # a: closed v1 + open v2
    a = sorted(by["a"], key=lambda r: r.valid_from)
    assert len(a) == 2
    assert a[0].title == "A v1" and a[0].valid_to == T2
    assert a[1].title == "A v2" and a[1].valid_from == T2 and a[1].valid_to is None
    # b: untouched single current row
    assert len(by["b"]) == 1 and by["b"][0].valid_to is None
    # c: inserted as current
    assert len(by["c"]) == 1 and by["c"][0].valid_from == T2


def test_scd2_idempotent_reapply(spark):
    table_rows = [("a", "A v1", "n1", T1, None)]
    upd_rows = [("a", "A v2", "n2", T2)]
    spark_df = spark.createDataFrame(table_rows, SCHEMA)
    upd = spark.createDataFrame(upd_rows, UPD_SCHEMA)
    once = scd2_merge(spark_df, upd, ["entry_id"], ["title", "version_note"])
    twice = scd2_merge(once, upd, ["entry_id"], ["title", "version_note"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_snapshot_at(spark):
    table_rows = [
        ("a", "A v1", "n1", T1, T2),
        ("a", "A v2", "n2", T2, None),
    ]
    table = spark.createDataFrame(table_rows, SCHEMA)
    at_t1 = {r.entry_id: r.title for r in
             snapshot_at(table, F.lit(T1).cast("timestamp"),
                         ["entry_id"]).collect()}
    mid = T1 + (T2 - T1) / 2
    at_mid = {r.entry_id: r.title for r in
              snapshot_at(table, F.lit(mid).cast("timestamp"),
                          ["entry_id"]).collect()}
    at_t3 = {r.entry_id: r.title for r in
             snapshot_at(table, F.lit(T3).cast("timestamp"),
                         ["entry_id"]).collect()}
    assert at_t1 == {"a": "A v1"}
    assert at_mid == {"a": "A v1"}
    assert at_t3 == {"a": "A v2"}


def test_scd2_multiple_updates_same_key_keep_latest(spark):
    """A batch with several rows for one key must yield exactly ONE
    open version (the latest by effective_ts) — two open rows would
    corrupt the one-current-row-per-key invariant. Intermediate
    versions within a batch are not materialized (MERGE-per-batch
    semantics)."""
    table_rows = [("a", "A v1", "n1", T1, None)]
    upd_rows = [
        ("a", "A v2", "n2", T2),
        ("a", "A v3", "n3", T3),        # latest wins
    ]
    rows = _merge(spark, table_rows, upd_rows)
    a = sorted(rows, key=lambda r: r.valid_from)
    open_rows = [r for r in a if r.valid_to is None]
    assert len(open_rows) == 1
    assert open_rows[0].title == "A v3" and open_rows[0].valid_from == T3
    # v1 closed at the surviving update's ts
    assert a[0].title == "A v1" and a[0].valid_to == T3
    assert len(a) == 2

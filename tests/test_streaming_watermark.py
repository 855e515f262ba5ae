"""O-37 late/duplicate-data policy as a stream (SURVEY.md §2.I): the
reference handles lateness with a 6-month id-lookback dedup; the
streaming-native form is withWatermark + dropDuplicatesWithinWatermark
— duplicate ids arriving within the watermark horizon are dropped,
state for expired ids is reclaimed.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("entry_id", T.StringType()),
    T.StructField("event_time", T.TimestampType()),
    T.StructField("payload", T.StringType()),
])


def _write(spark, d, name, rows):
    from .conftest import local_df

    local_df(spark, rows, SCHEMA).coalesce(1).write.parquet(str(d / name))


def _drain(spark, src, ckpt):
    collected = []
    stream = (
        spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["entry_id"])
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _e: collected.extend(b.collect()))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def test_dropduplicates_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    _write(spark, src, "b1", [
        ("a", t0, "first"),
        ("a", t0 + dt.timedelta(minutes=5), "dup-in-batch"),
        ("b", t0, "first"),
    ])
    out1 = _drain(spark, src, ckpt)
    assert sorted(r.entry_id for r in out1) == ["a", "b"]

    # duplicate arriving in a later micro-batch but within the 1h
    # watermark horizon -> dropped by the checkpointed dedup state
    _write(spark, src, "b2", [
        ("a", t0 + dt.timedelta(minutes=30), "dup-across-batch"),
        ("c", t0 + dt.timedelta(minutes=30), "first"),
    ])
    out2 = _drain(spark, src, ckpt)
    assert sorted(r.entry_id for r in out2) == ["c"]

    # advance the watermark far past a's horizon (watermark moves at
    # batch END, so the advancing event and the retry are separate
    # batches) ...
    _write(spark, src, "b3", [
        ("wm-pusher", t0 + dt.timedelta(days=2), "advances watermark"),
    ])
    out3 = _drain(spark, src, ckpt)
    assert sorted(r.entry_id for r in out3) == ["wm-pusher"]

    # ... then the same id re-appearing beyond the horizon is NEW again:
    # its dedup state was reclaimed (bounded memory; the reference's
    # 6-month-lookback analogue)
    _write(spark, src, "b4", [
        ("a", t0 + dt.timedelta(days=2, minutes=10), "long-after"),
    ])
    out4 = _drain(spark, src, ckpt)
    assert sorted(r.entry_id for r in out4) == ["a"]

"""Stream-stream interval join (Structured Streaming extension
surface): correlating two live event streams — the streaming analog
of the as-of/range join family. Both sides carry watermarks and the
join predicate bounds event-time distance, so Spark can size and
expire the join state; without the time bound the state would grow
unboundedly at 100 TB/day stream rates.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .conftest import local_df

VIEW_SCHEMA = T.StructType([
    T.StructField("view_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("view_time", T.TimestampType()),
])
CLICK_SCHEMA = T.StructType([
    T.StructField("click_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("click_time", T.TimestampType()),
])

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


VIEWS = [(1, 100, _m(0)), (2, 100, _m(30)), (3, 200, _m(5)), (4, 300, _m(10))]
CLICKS = [
    (11, 100, _m(4)),    # joins view 1 (within 10 min)
    (12, 100, _m(33)),   # joins view 2
    (13, 200, _m(16)),   # outside 10 min of view 3 -> no join
    (14, 300, _m(10)),   # boundary: equal times join
    (15, 400, _m(7)),    # user with no view -> no join
]


def _expected():
    out = set()
    for vid, vu, vt in VIEWS:
        for cid, cu, ct in CLICKS:
            if vu == cu and vt <= ct <= vt + dt.timedelta(minutes=10):
                out.add((vid, cid))
    return out


def test_stream_stream_interval_join(spark, tmp_path):
    vdir, cdir = tmp_path / "views", tmp_path / "clicks"
    for d, schema, rows in ((vdir, VIEW_SCHEMA, VIEWS),
                            (cdir, CLICK_SCHEMA, CLICKS)):
        d.mkdir()
        local_df(spark, rows, schema).coalesce(1).write.mode(
            "append").parquet(str(d))

    views = (spark.readStream.schema(VIEW_SCHEMA).parquet(str(vdir))
             .withWatermark("view_time", "1 hour"))
    clicks = (spark.readStream.schema(CLICK_SCHEMA).parquet(str(cdir))
              .withWatermark("click_time", "1 hour"))

    joined = views.alias("v").join(
        clicks.alias("c"),
        (F.col("v.user_id") == F.col("c.user_id"))
        & (F.col("c.click_time") >= F.col("v.view_time"))
        & (F.col("c.click_time") <= F.col("v.view_time") + F.expr("INTERVAL 10 MINUTES")),
    ).select("view_id", "click_id")

    collected = []
    q = (joined.writeStream
         .foreachBatch(lambda b, _e: collected.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    assert {(r.view_id, r.click_id) for r in collected} == _expected()
    # sanity: the streaming result is exactly the batch join result
    bv = local_df(spark, VIEWS, VIEW_SCHEMA).alias("v")
    bc = local_df(spark, CLICKS, CLICK_SCHEMA).alias("c")
    batch = bv.join(bc, (F.col("v.user_id") == F.col("c.user_id"))
                    & (F.col("c.click_time") >= F.col("v.view_time"))
                    & (F.col("c.click_time") <= F.col("v.view_time")
                       + F.expr("INTERVAL 10 MINUTES")))
    assert {(r.view_id, r.click_id) for r in batch.collect()} == _expected()


def test_streaming_session_window_agg(spark, tmp_path):
    """Built-in session_window with a watermark: gaps > 10 min close a
    session; result equals the batch session_window aggregation."""
    import datetime as dt

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, m(0), 1.0), (1, m(5), 2.0),      # session A: 0-15
        (1, m(40), 3.0),                     # session B: 40-50
        (2, m(2), 5.0),                      # session C: 2-12
    ]
    src = tmp_path / "sessions_src"
    src.mkdir()
    local_df(spark, rows, schema).coalesce(1).write.parquet(
        str(src / "b1"))

    agg_cols = [F.count("*").alias("n"), F.sum("value").alias("v")]
    stream = (
        spark.readStream.schema(schema).parquet(str(src / "*"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "10 minutes"), F.col("user_id"))
        .agg(*agg_cols)
    )
    collected = []

    def drain():
        stream = (
            spark.readStream.schema(schema).parquet(str(src / "*"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "10 minutes"), F.col("user_id"))
            .agg(*agg_cols)
        )
        q = (stream.writeStream
             .foreachBatch(lambda b, _e: collected.extend(b.collect()))
             .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    drain()
    # append mode emits a session only after the watermark passes its
    # close; nothing can emit from the first drop alone
    assert collected == []
    # a much-later event advances the watermark past all three sessions
    local_df(spark, [(99, m(240), 0.0)], schema).coalesce(1) \
        .write.parquet(str(src / "b2"))
    drain()

    got = {(r.user_id, r.session_window.start, r.session_window.end):
           (r.n, r.v) for r in collected}
    batch = (local_df(spark, rows, schema)
             .groupBy(F.session_window("ts", "10 minutes"), "user_id")
             .agg(*agg_cols))
    want = {(r.user_id, r.session_window.start, r.session_window.end):
            (r.n, r.v) for r in batch.collect()}
    assert got == want  # user 99's still-open session is NOT emitted
    assert len(got) == 3  # two sessions for user 1, one for user 2


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join — the enrich-events-with-a-dimension pattern
    (the third join mode after stream-stream and batch): a file-source
    stream of events broadcast-joined to a STATIC dim table inside the
    stream, aggregated, drained with availableNow. Result must equal
    the same plan run as a plain batch query. Static sides need no
    watermark and hold no state — at 100 TB/day stream rates the dim
    is a broadcast, exactly as in batch."""
    events_dir = tmp_path / "sevents"
    events_dir.mkdir()
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    rows = [(i, ["view", "click", "purchase"][i % 3], float(i)) for i in range(60)]
    local_df(spark, rows, schema).coalesce(2).write.mode(
        "append").parquet(str(events_dir))

    dim = local_df(spark, 
        [("view", 1.0), ("click", 2.5), ("purchase", 10.0)],
        ["event_type", "weight"])

    def plan(src):
        j = src.join(F.broadcast(dim), "event_type")
        return (j.groupBy("event_type")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum(F.col("value") * F.col("weight")), 2)
                      .alias("weighted")))

    stream = spark.readStream.schema(schema).parquet(str(events_dir))
    out_rows = {}

    (plan(stream).writeStream.outputMode("complete")
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .foreachBatch(lambda df, e: [out_rows.update(
         {r.event_type: (r.n, r.weighted)}) for r in df.collect()])
     .trigger(availableNow=True).start().awaitTermination(120))

    want = {r.event_type: (r.n, r.weighted)
            for r in plan(spark.read.parquet(str(events_dir))).collect()}
    assert out_rows == want

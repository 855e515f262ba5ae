"""streaming/sessions.py — native session_window aggregation:
streaming ≡ batch over the same events, watermark-driven emission,
and the inclusive gap-boundary merge semantics the batch oracle
(events_session_windows) encodes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hackmd_data_pipeline_spark.streaming.sessions import session_window_agg

from .conftest import local_df

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


# user 100: two sessions (break at 31 > 30-min gap); user 200: one
# session whose second event lands EXACTLY at the gap boundary
# (inclusive merge); user 300: singleton
ROWS = [
    (100, _m(0), 1.5), (100, _m(10), 2.5),     # session 1
    (100, _m(41.5), 4.0),                      # 31.5 min gap -> session 2
    (200, _m(0), 1.0), (200, _m(30), 1.0),     # boundary: merges
    (300, _m(5), 7.25),
]


def _drain(spark, src, ckpt, collected):
    stream = (spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
              .withWatermark("ts", "10 minutes"))
    q = (session_window_agg(stream, gap="30 minutes")
         .writeStream
         .foreachBatch(lambda b, _e: collected.extend(b.collect()))
         .option("checkpointLocation", str(ckpt))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def test_streaming_equals_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    batch = {tuple(r) for r in session_window_agg(
        local_df(spark, ROWS, SCHEMA), gap="30 minutes").collect()}

    collected: list = []
    local_df(spark, ROWS, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1"))
    _drain(spark, src, ckpt, collected)
    # nothing finalized yet: the watermark only advances at batch END
    streamed_early = {tuple(r) for r in collected}
    assert streamed_early < batch or streamed_early == set()

    # push the watermark far past every session's end -> all real
    # sessions close and emit (bounded state reclaimed)
    pusher = [(999, T0 + dt.timedelta(days=1), 0.0)]
    local_df(spark, pusher, SCHEMA).coalesce(1).write.parquet(
        str(src / "b2"))
    _drain(spark, src, ckpt, collected)

    streamed = {tuple(r) for r in collected}
    assert batch <= streamed
    # the only extra row the stream may still hold back is the pusher's
    assert all(r[0] == 999 for r in streamed - batch)


def test_session_shapes(spark):
    out = {(r.user_id, r.session_start, r.session_end, r.n_events,
            r.value_sum)
           for r in session_window_agg(
               local_df(spark, ROWS, SCHEMA), gap="30 minutes")
           .collect()}
    assert out == {
        (100, _m(0), _m(40), 2, 4.0),
        (100, _m(41.5), _m(71.5), 1, 4.0),
        (200, _m(0), _m(60), 2, 2.0),     # inclusive boundary merge
        (300, _m(5), _m(35), 1, 7.25),
    }


def test_streaming_state_is_session_window(spark, tmp_path):
    """The physical streaming plan uses the dedicated session-window
    state operator (merging sessions), not a generic agg."""
    src = tmp_path / "src"
    src.mkdir()
    local_df(spark, ROWS, SCHEMA).coalesce(1).write.parquet(
        str(src / "b1"))
    stream = (spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
              .withWatermark("ts", "10 minutes"))
    plan = session_window_agg(stream)._jdf.queryExecution().analyzed().toString()
    assert "session_window" in plan


def test_late_event_merges_into_open_session(spark, tmp_path):
    """A late event (within the watermark) arriving in a LATER
    micro-batch merges into the still-open session state — the
    cross-batch merge that distinguishes session windows from a
    per-batch groupBy."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    collected: list = []

    local_df(spark, [(7, _m(0), 1.0), (7, _m(20), 1.0)],
                          SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    _drain(spark, src, ckpt, collected)

    # late arrival BETWEEN the two seen events, same session
    local_df(spark, [(7, _m(10), 5.0)],
                          SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    _drain(spark, src, ckpt, collected)

    # close everything
    local_df(spark, [(999, T0 + dt.timedelta(days=1), 0.0)],
                          SCHEMA).coalesce(1).write.parquet(str(src / "b3"))
    _drain(spark, src, ckpt, collected)

    sessions = {tuple(r) for r in collected if r[0] == 7}
    assert sessions == {(7, _m(0), _m(50), 3, 7.0)}

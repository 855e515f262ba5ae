"""Native session-window aggregation (Structured Streaming surface).

``events_sessionization`` (plans/relational.py) restates sessions as a
batch gaps-and-islands window — two analytic passes over a sorted
partition. That shape cannot run on an unbounded stream: the running
``SUM(new_session)`` needs the whole user history. Spark's
``session_window`` operator is the streaming-native form — state is
per (key, open session), sessions merge as events arrive, and the
watermark closes and emits a session once event time passes its end.
This module is the one entry point both forms share: the SAME plan
builds on a batch DataFrame (driver-oracled as
``events_session_windows``) and on a watermarked ``readStream``
(streaming ≡ batch pinned in tests/test_streaming_sessions.py).

Merge semantics (probed empirically, pinned by test): an event at
``t`` opens window ``[t, t + gap]``; it merges into a session iff
``t <= prev_end`` — INCLUSIVE, so an event landing exactly at
``prev_end`` still merges. The break condition is therefore
``diff > gap``, identical to the batch gaps-and-islands form; the
session end is ``last_event + gap``, not ``last_event``.

100 TB posture: one shuffle on the session key; state size is bounded
by (active keys x open sessions) and the watermark reclaims closed
sessions — the operator is exactly as scalable as any watermarked
streaming aggregation. At 1000 executors the only knob that matters
is key cardinality, same as the batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_agg(events: DataFrame, gap: str = "30 minutes",
                       ts_col: str = "ts", key_col: str = "user_id",
                       value_col: str = "value") -> DataFrame:
    """Per-key session aggregation via the native ``session_window``.

    Works identically over a batch DataFrame and a watermarked
    streaming DataFrame (append mode needs the watermark so closed
    sessions can be finalized)."""
    return (
        events.groupBy(F.col(key_col),
                       F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(value_col), 2).alias("value_sum"))
        .select(key_col,
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events", "value_sum")
    )

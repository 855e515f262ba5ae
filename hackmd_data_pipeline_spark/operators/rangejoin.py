"""Bounded-interval range join via time-bin bucketing.

A range predicate ``r.ts BETWEEN l.ts - delta AND l.ts`` would plan a
nested-loop join in vanilla Spark (non-equi condition). The scalable
formulation exploits the BOUNDED interval: bucket time into
``delta``-wide bins; a qualifying right row's bin can only be the left
row's bin or the one before it. So: explode the left side to its 2
candidate bins, bin the right side once, EQUI-join on (keys..., bin),
then apply the exact range filter. The join shuffles by (key, bin) —
bucket-bounded work, never all-pairs — which is the same posture as
the LSH band join and Structured Streaming's own interval-join state
layout.

Cost model: left rows duplicate 2x (bin fan-out), every true match is
produced exactly once (the right row has ONE bin; the left row's
candidate-bin list is distinct), so no post-join dedup is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame,
                  on: Sequence[str], left_ts: str, right_ts: str,
                  delta_seconds: int) -> DataFrame:
    """Rows (l, r) with matching ``on`` keys and
    ``l.ts - delta <= r.ts <= l.ts``.

    Both timestamps must be TIMESTAMP_NTZ (the engine's events
    convention); binning is pure epoch arithmetic, timezone-proof.
    Left/right columns pass through (same-named join keys merge);
    callers project/alias afterwards.
    """
    if delta_seconds <= 0:
        raise ValueError(f"delta_seconds must be positive, got {delta_seconds}")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")

    def bin_of(col):
        return F.floor(
            F.timestamp_diff("SECOND", epoch, F.col(col)) / delta_seconds)

    lb = left.withColumn(
        "_bin", F.explode(F.array(bin_of(left_ts) - 1, bin_of(left_ts))))
    rb = right.withColumn("_bin", bin_of(right_ts))
    cond = (
        (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) >= F.timestamp_add(
            "SECOND", F.lit(-delta_seconds), F.col(left_ts)))
    )
    return (
        lb.join(rb, [*on, "_bin"])
        .filter(cond)
        .drop("_bin")
    )

"""Join operators Spark lacks natively (north-star extension surface).

The reference performs no explicit SQL joins (SURVEY.md §2.H); its
join-shaped logic is the anti-join dedup family. For a time-series /
training-data engine we add the as-of join — "for each left row, the
most recent right row at or before it" — with the union-scan
formulation:

  tag both sides, union, one window partitioned by key ordered by
  (ts, side), carry the last right-side payload forward, keep left
  rows. ONE shuffle on the key, no range join, no per-row probe —
  this is the formulation that survives 100 TB (a naive
  range-condition join explodes into a nested-loop or an
  interval-join with quadratic worst case).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# ceiling for broadcasting a TOMBSTONE set into an anti-join (r09
# VERDICT item 5): deletion sets are tiny between compactions, but a
# heavy right-to-be-forgotten regime can accumulate an unbounded one —
# under the ceiling the exclusion broadcasts (data side streams), over
# it the planner's shuffle strategies take over (AQE may still pick
# broadcast from runtime stats, just never on our unconditional
# say-so). Bytes, measured by one getContentSummary metadata call on
# the tombstone directory — the gate itself never costs a scan.
# Env-overridable so the SCALE.md sweep can force the large-set
# posture on small fixtures.
TOMBSTONE_BROADCAST_MAX_BYTES = int(_os.environ.get(
    "SPARK_GRAFT_TOMBSTONE_BROADCAST_MAX_BYTES", str(64 << 20)))


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              payload_cols: tuple[str, ...],
              direction: str = "backward") -> DataFrame:
    """As-of join: attach the latest ``right`` payload at-or-before each
    ``left`` row's timestamp (direction='backward'; 'forward' attaches
    the earliest at-or-after).

    Left columns pass through; each payload column p arrives as
    ``p_asof`` (NULL when no right row qualifies). Right rows at the
    exact same timestamp DO qualify (<= semantics), with the latest
    (by ts, then arbitrary-but-deterministic input order) winning.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"_p_{p}") for p in payload_cols],
    )
    tagged_right = right.select(
        on, ts_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (on, ts_col)],
        F.lit(0).alias("_side"),
        *[F.col(p).alias(f"_p_{p}") for p in payload_cols],
    ).select(*lcols, "_side", *[f"_p_{p}" for p in payload_cols])

    u = tagged_left.unionByName(tagged_right)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts => <= semantics
        w = (W.partitionBy(on).orderBy(F.col(ts_col).asc(), F.col("_side").asc())
             .rowsBetween(W.unboundedPreceding, 0))
        carried = [F.last(f"_p_{p}", ignorenulls=True).over(w).alias(f"{p}_asof")
                   for p in payload_cols]
    else:
        w = (W.partitionBy(on).orderBy(F.col(ts_col).asc(), F.col("_side").desc())
             .rowsBetween(0, W.unboundedFollowing))
        carried = [F.first(f"_p_{p}", ignorenulls=True).over(w).alias(f"{p}_asof")
                   for p in payload_cols]

    return (
        u.select(*lcols, "_side", *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def bounded_anti_join(batch: DataFrame, stored_keys: DataFrame,
                      batch_key: str, stored_key: str | None = None
                      ) -> DataFrame:
    """``batch`` rows whose key does NOT appear in ``stored_keys``,
    planned so that NO broadcast scales with the STORE side — the
    table-wide ON-CONFLICT skip of a continuous-ingest pipeline (r08
    VERDICT item 1).

    The naive form ``batch.join(broadcast(stored_keys), anti)``
    broadcasts the ENTIRE stored key set per micro-batch: build-side
    memory grows monotonically with the store, and at 10^9+ stored
    keys that is a per-batch multi-GB broadcast and a driver/executor
    OOM — the one failure mode the store-streams/batch-broadcasts
    discipline exists to prevent. This helper uses the two-step
    bounded form instead:

      1. matched = stored_keys LEFT SEMI broadcast(batch keys) — the
         STORE streams through a BroadcastHashJoin whose build side is
         the batch's distinct keys (bounded by batch size; the store
         is scanned, narrow-column, never shuffled and never
         broadcast);
      2. batch LEFT ANTI broadcast(matched) — the build side is the
         matched set, <= batch-sized BY CONSTRUCTION regardless of
         store size.

    Both broadcasts are therefore bounded by the BATCH, per-batch cost
    is two store-column scans' worth of IO plus O(batch), and the plan
    shape is asserted in tests/test_physical_plans.py (any store rows
    crossing a BroadcastExchange must have been semi-joined down to
    batch cardinality first). ``stored_key`` defaults to
    ``batch_key``."""
    sk = stored_key or batch_key
    bkeys = batch.select(F.col(batch_key).alias("_bk")).distinct()
    matched = (stored_keys.select(F.col(sk).alias("_bk"))
               .join(F.broadcast(bkeys), "_bk", "left_semi")
               .distinct())
    return batch.join(F.broadcast(matched),
                      batch[batch_key] == F.col("_bk"), "left_anti")

"""Incremental time-rollup maintenance (hypertable-style aggregates).

A 100 TB events store is queried through pre-aggregated rollups
(hourly/daily), not raw scans. The maintenance problem is INCREMENTAL
refresh: when late data lands for a handful of dates, recompute ONLY
those date partitions, idempotently, without touching the rest of the
rollup table. Spark-native answer: date-partitioned parquet +
``partitionOverwriteMode=dynamic`` — the write replaces exactly the
partitions present in the refresh DataFrame and leaves every other
partition byte-identical. Re-running the same refresh is a no-op
(same input -> same partition contents), which is the idempotency
contract the reference gets from ON CONFLICT DO NOTHING (reference
src/core/pg_engine.py:113) transplanted to analytical storage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAINS = ("hour", "day")


def _trunc(ts, grain: str):
    """NTZ-safe truncation: integer epoch arithmetic. date_trunc would
    coerce a TIMESTAMP_NTZ through the session timezone — under a
    non-UTC driver session the bucket boundaries would shift."""
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {_GRAINS}, got {grain!r}")
    unit = grain.upper()
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_add(unit, F.timestamp_diff(unit, epoch, ts), epoch)


def time_rollup(events: DataFrame, grain: str = "hour",
                ts_col: str = "ts", key_cols: Sequence[str] = ("event_type",),
                value_col: str = "value") -> DataFrame:
    """Tumbling-``grain`` aggregate: one row per (bucket, *key_cols)
    with count / sum / min / max — the mergeable-summary set (avg is
    derivable as sum/count downstream; quantiles would use mergeable
    approx sketches). Single shuffle on the group keys; the
    ``event_date`` column doubles as the storage partition key."""
    bucket = _trunc(F.col(ts_col), grain)
    return (
        events.groupBy(F.to_date(bucket).alias("event_date"),
                       bucket.alias("bucket"), *key_cols)
        .agg(F.count("*").alias("n_events"),
             F.sum(value_col).alias("sum_value"),
             F.min(value_col).alias("min_value"),
             F.max(value_col).alias("max_value"))
    )


def refresh_rollup(events: DataFrame, dest: str, grain: str = "hour",
                   dates: Sequence[str] | None = None,
                   ts_col: str = "ts",
                   key_cols: Sequence[str] = ("event_type",),
                   value_col: str = "value") -> None:
    """(Re)build the rollup at ``dest`` for ``dates`` (None = all).

    The date filter is applied to the RAW events before aggregation —
    at scale the events table is itself date-partitioned, so the
    filter prunes input partitions and the refresh reads only the
    affected dates' data. Dynamic partition overwrite then swaps in
    exactly those output partitions atomically per-partition."""
    spark = events.sparkSession
    if dates is not None:
        events = events.filter(F.to_date(_trunc(F.col(ts_col), grain))
                               .isin([str(d) for d in dates]))
    rolled = time_rollup(events, grain, ts_col, key_cols, value_col)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (rolled.repartition("event_date")
         .write.partitionBy("event_date").mode("overwrite").parquet(dest))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def merge_rollup_batch(batch: DataFrame, dest: str, grain: str = "hour",
                       ts_col: str = "ts",
                       key_cols: Sequence[str] = ("event_type",),
                       value_col: str = "value") -> None:
    """Merge one micro-batch of raw events into the rollup at ``dest``.

    The rollup's aggregates are MERGEABLE (count/sum/min/max), so a
    streaming refresh never re-reads the raw history: aggregate the
    batch, union it with the EXISTING rollup rows of just the affected
    dates, re-aggregate (sum the counts/sums, min/max the extremes),
    and dynamic-partition-overwrite those dates. Cost per micro-batch
    is proportional to the batch + touched partitions, independent of
    total history size — the property that makes a 100 TB rollup
    maintainable from a stream. Designed for foreachBatch (see
    streaming tests); idempotent per batch only if the batch is
    replayed whole, which is exactly Spark's foreachBatch replay unit.
    """
    spark = batch.sparkSession
    delta = time_rollup(batch, grain, ts_col, key_cols, value_col)
    dates = [str(r.event_date)
             for r in delta.select("event_date").distinct().collect()]
    if not dates:
        return
    merged = delta
    try:
        existing = (spark.read.parquet(dest)
                    .filter(F.col("event_date").isin(dates))
                    .select(*delta.columns))
        merged = delta.unionByName(existing)
    except AnalysisException as e:
        # first batch: no rollup exists yet. ONLY the missing-path
        # case may be swallowed — schema drift (also an
        # AnalysisException: unresolved column) and FS errors must
        # propagate, or the dynamic-partition overwrite below would
        # silently replace affected dates with delta-only aggregates.
        if "PATH_NOT_FOUND" not in str(e):
            raise
    merged = (
        merged.groupBy("event_date", "bucket", *key_cols)
        .agg(F.sum("n_events").alias("n_events"),
             F.sum("sum_value").alias("sum_value"),
             F.min("min_value").alias("min_value"),
             F.max("max_value").alias("max_value"))
        # materialize BEFORE the write: the plan reads the same path
        # it is about to overwrite (classic self-overwrite hazard)
        .localCheckpoint(eager=True)
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (merged.repartition("event_date")
         .write.partitionBy("event_date").mode("overwrite").parquet(dest))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def time_rollup_sketch(events: DataFrame, grain: str = "day",
                       ts_col: str = "ts",
                       key_cols: Sequence[str] = ("event_type",),
                       user_col: str = "user_id") -> DataFrame:
    """Tumbling-``grain`` DISTINCT-USER rollup as a mergeable HLL
    sketch column: one row per (bucket, *key_cols) carrying
    ``users_hll`` (binary DataSketches HLL state) + ``n_events``.

    COUNT(DISTINCT) is the one aggregate the count/sum/min/max rollup
    family cannot maintain incrementally — re-aggregating distincts
    requires the raw history. Sketches restore mergeability: the HLL
    register state unions associatively, so per-batch sketches merge
    into the stored ones register-wise and the estimate over any date
    range is one ``hll_union_agg`` + ``hll_sketch_estimate`` away,
    never a raw re-scan. This is the standard 100 TB rollup design for
    distinct counts (same posture as agg_hll_mergeable, persisted)."""
    bucket = _trunc(F.col(ts_col), grain)
    return (
        events.groupBy(F.to_date(bucket).alias("event_date"),
                       bucket.alias("bucket"), *key_cols)
        .agg(F.hll_sketch_agg(user_col).alias("users_hll"),
             F.count("*").alias("n_events"))
    )


def merge_rollup_sketch_batch(batch: DataFrame, dest: str,
                              grain: str = "day", ts_col: str = "ts",
                              key_cols: Sequence[str] = ("event_type",),
                              user_col: str = "user_id") -> None:
    """Merge one micro-batch into the HLL distinct-user rollup at
    ``dest`` — the sketch analogue of ``merge_rollup_batch``: sketch
    the batch, union register-wise with the stored sketches of the
    affected dates, dynamic-partition-overwrite those dates. HLL
    union is exact over the register state (the merged sketch is
    IDENTICAL to a single-pass sketch of the union — asserted in
    tests/test_rollup.py), so incremental maintenance loses nothing
    vs a full rebuild."""
    spark = batch.sparkSession
    delta = time_rollup_sketch(batch, grain, ts_col, key_cols, user_col)
    dates = [str(r.event_date)
             for r in delta.select("event_date").distinct().collect()]
    if not dates:
        return
    merged = delta
    try:
        existing = (spark.read.parquet(dest)
                    .filter(F.col("event_date").isin(dates))
                    .select(*delta.columns))
        merged = delta.unionByName(existing)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
    merged = (
        merged.groupBy("event_date", "bucket", *key_cols)
        .agg(F.hll_union_agg("users_hll").alias("users_hll"),
             F.sum("n_events").alias("n_events"))
        .localCheckpoint(eager=True)  # self-overwrite hazard, as above
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (merged.repartition("event_date")
         .write.partitionBy("event_date").mode("overwrite").parquet(dest))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def sketch_rollup_estimates(spark, dest: str,
                            key_cols: Sequence[str] = ("event_type",)) -> DataFrame:
    """Read back the sketch rollup as human-facing estimates:
    per-(date, keys) distinct users, plus nothing else — the binary
    state stays in storage."""
    return (
        spark.read.parquet(dest)
        .select("event_date", *key_cols,
                F.hll_sketch_estimate("users_hll").alias("est_distinct_users"),
                "n_events")
        .orderBy("event_date", *key_cols)
    )

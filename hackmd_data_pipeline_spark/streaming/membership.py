"""Streaming Bloom-filter maintenance — the persisted membership store
behind continuous ingest dedup.

The batch operator (operators/membership.py + dedup_bloom_prefilter)
answers "seen before?" against a filter built in one pass. A
continuously-ingesting pipeline instead maintains that filter FROM THE
STREAM: each micro-batch contributes its keys' bit positions, and the
store must stay correct across foreachBatch retries (Structured
Streaming is at-least-once per epoch — the round-2 replay hazard).

Bloom bits make this trivial compared to counters: the merge is set
UNION, which is idempotent, so the store reuses the delta-epoch layout
from operators/rollup.py verbatim:

    dest/deltas/epoch=<id>/  per-epoch bit table (OVERWRITE by epoch
                             id -> replays rewrite, never append)
    dest/gen-<k>/            compacted bit table + absorbed ledger
    dest/_current            active-generation pointer

Per-epoch delta cost is O(batch keys), never a read of prior state;
compaction is a distinct over <= num_bits rows however much history
the filter summarizes. The reference's per-batch `WHERE NOT EXISTS`
dedup (reference src/extract/arxiv_collector.py:123-134) needs the
full corpus live in Postgres; this store answers the same question
from kilobytes-per-epoch parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.membership import bloom_build, bloom_might_contain
from ..operators.rollup import _compact_generic, _store_parts


def append_bloom_delta(batch: DataFrame, dest: str, epoch_id: int,
                       key: Column, num_bits: int,
                       num_hashes: int) -> None:
    """Write one micro-batch's Bloom bit positions as an epoch-keyed
    delta. Pass the ``foreachBatch`` epoch id: a retried epoch
    OVERWRITES its own directory, so at-least-once replay converges to
    exactly-once stored state (and since the merge is a set union,
    even a DIFFERENT batch split on retry stays correct as long as the
    union of keys is the same)."""
    bits = bloom_build(batch, key, num_bits, num_hashes)
    bits.write.mode("overwrite").parquet(f"{dest}/deltas/epoch={epoch_id}")


def read_bloom_bits(spark: SparkSession, dest: str) -> DataFrame:
    """Merged bit table over (active generation) + (pending deltas) —
    ``pos: long``, <= num_bits rows. Valid at ANY compaction state."""
    parts = _store_parts(spark, dest)
    if not parts:
        raise ValueError(f"empty bloom store at {dest}")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.distinct()


def compact_bloom(spark: SparkSession, dest: str) -> dict:
    """Fold pending deltas into a new generation (one distinct over
    <= num_bits rows) and flip the pointer — same crash-window
    guarantees as compact_rollup (shared core)."""
    return _compact_generic(spark, dest,
                            lambda: read_bloom_bits(spark, dest))


def bloom_filter_batch(batch: DataFrame, dest: str, key: Column,
                       num_bits: int, num_hashes: int,
                       out_col: str = "bloom_pass") -> DataFrame:
    """Prefilter an incoming batch against the persisted store:
    appends ``out_col`` (true = possibly seen, run the exact verify;
    false = guaranteed new). One broadcast hash join against the
    merged bit table."""
    bits = read_bloom_bits(batch.sparkSession, dest)
    return bloom_might_contain(batch, bits, key, num_bits, num_hashes,
                               out_col)


def maintain_bloom_stream(stream: DataFrame, dest: str, checkpoint: str,
                          key_col: str, num_bits: int, num_hashes: int):
    """Drive the store from a stream: ``availableNow`` drain writing
    one epoch-keyed delta per micro-batch. Returns the query handle
    (caller awaits termination). Restart-safe: the checkpoint replays
    unfinished epochs into the same delta directories."""
    return (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda b, e: append_bloom_delta(
            b, dest, e, F.col(key_col), num_bits, num_hashes))
        .start()
    )


# ---------------------------------------------------------------- #
# Count-min frequency store — the second mergeable ingest sketch.   #
# Unlike the Bloom bits, the cellwise-SUM merge is NOT idempotent,  #
# so replay safety rests entirely on the epoch-keyed overwrite (the #
# same argument as rollup kind='plain'): a retried epoch rewrites   #
# its own delta directory, and the ledger keeps an epoch from being #
# double-absorbed across compactions.                               #
# ---------------------------------------------------------------- #

def append_cms_delta(batch: DataFrame, dest: str, epoch_id: int,
                     key: Column, weight: Column, depth: int,
                     width: int) -> None:
    """Write one micro-batch's count-min counter table (j | pos | cnt,
    <= depth x width rows) as an epoch-keyed delta."""
    from ..operators.membership import cms_build

    ctr = cms_build(batch, key, weight, depth, width)
    ctr.write.mode("overwrite").parquet(f"{dest}/deltas/epoch={epoch_id}")


def read_cms_counters(spark: SparkSession, dest: str) -> DataFrame:
    """Merged counter table over (active generation) + (pending
    deltas): cellwise sum, <= depth x width rows at any history."""
    parts = _store_parts(spark, dest)
    if not parts:
        raise ValueError(f"empty cms store at {dest}")
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.groupBy("j", "pos").agg(F.sum("cnt").alias("cnt"))


def compact_cms(spark: SparkSession, dest: str) -> dict:
    """Fold pending counter deltas into a new generation (same
    crash-window guarantees as compact_rollup — shared core)."""
    return _compact_generic(spark, dest,
                            lambda: read_cms_counters(spark, dest))


def cms_estimate_batch(keys: DataFrame, dest: str, key: Column,
                       depth: int, width: int,
                       out_col: str = "cms_est") -> DataFrame:
    """All-time frequency estimates for ``keys`` against the persisted
    store — one broadcast of the merged counter table, no raw-history
    read."""
    from ..operators.membership import cms_estimate

    counters = read_cms_counters(keys.sparkSession, dest)
    return cms_estimate(keys, counters, key, depth, width, out_col)

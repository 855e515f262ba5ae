"""Mergeable membership / frequency sketches: Bloom filter + count-min.

The two classic sketches an incremental 100 TB ingest actually runs:

* **Bloom prefilter** — "has this key ever been seen?" against a
  historical key set too large to anti-join per batch. The filter is
  built ONCE over history (one scan, map-side-combinable distinct of
  bit positions), persists as a tiny sparse bit table (<= num_bits
  rows), and every incoming batch broadcast-joins it: the guaranteed
  no-false-negative cut means the expensive exact verify runs only on
  the (few) bloom survivors. Merging two filters = UNION of their bit
  tables, so per-day filters roll up to all-time without rescanning.
  The reference dedups every batch by exact anti-join against the full
  corpus (reference src/extract/arxiv_collector.py:123-134 `WHERE NOT
  EXISTS`); this is that operator's scale form.

* **Count-min sketch** — mergeable frequency estimates (heavy
  hitters) in O(depth x width) space per group/day, merged by
  element-wise add. Never underestimates; overestimate bounded by
  ~2N/width per probe row.

Both sketches derive ALL probe positions from a single JVM-side
``xxhash64`` via Kirsch-Mitzenmacher double hashing::

    h1 = h >>> 32;  h2 = (h & 0xFFFFFFFF) | 1   # odd => full cycle
    pos_i = (h1 + i * h2) mod slots             # i = 0..probes-1

which keeps the hot path codegen'd (no UDF of any kind) AND makes the
whole sketch bit-restatable in DuckDB through the existing xxh64
oracle helpers — so the queries built on these are full value-hash
oracles, not tolerance checks. ``i*h2 + h1 < 2^36`` so the arithmetic
never overflows a signed 64-bit long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOW32 = 0xFFFFFFFF


def km_positions(hash_col: Column, num_slots: int, num_probes: int) -> Column:
    """Array of ``num_probes`` Kirsch-Mitzenmacher probe positions in
    ``[0, num_slots)`` derived from one 64-bit hash column. Forcing
    ``h2`` odd makes the stride a unit of Z_{2^k}, so for power-of-two
    ``num_slots`` the probe sequence never degenerates to a single
    repeated position."""
    h1 = F.shiftrightunsigned(hash_col, 32)
    h2 = hash_col.bitwiseAND(F.lit(_LOW32)).bitwiseOR(F.lit(1))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(num_slots)) for i in range(num_probes)]
    )


def bloom_build(df: DataFrame, key: Column, num_bits: int,
                num_hashes: int) -> DataFrame:
    """Build a Bloom filter over ``key`` as a SPARSE bit table
    ``pos: long`` (set positions only, <= num_bits rows).

    Plan shape: one scan -> explode(k positions) -> distinct. The
    distinct is map-side combinable and its output is bounded by
    num_bits regardless of input size, so the shuffle moves at most
    partitions x num_bits rows. Two filters over disjoint inputs merge
    by ``unionByName(...).distinct()`` — the rollup path.
    """
    pos = km_positions(F.xxhash64(key), num_bits, num_hashes)
    return df.select(F.explode(pos).alias("pos")).distinct()


def bloom_might_contain(df: DataFrame, bits: DataFrame, key: Column,
                        num_bits: int, num_hashes: int,
                        out_col: str = "bloom_pass") -> DataFrame:
    """Append ``out_col``: true iff ALL probe positions of ``key`` are
    set in ``bits`` (no false negatives; false positives at the
    standard Bloom rate).

    ``df``'s rows must be distinct (it is re-grouped on all its
    columns to fold the k probe rows back). The bit table is
    broadcast — membership is a broadcast hash join plus a map-side
    combinable count, never a shuffle of ``df``.
    """
    probe = df.withColumn(
        "_probe", F.explode(km_positions(F.xxhash64(key), num_bits, num_hashes)))
    marked = F.broadcast(bits.select(F.col("pos").alias("_setpos")))
    return (
        probe.join(marked, probe["_probe"] == marked["_setpos"], "left")
        .groupBy(*df.columns)
        .agg((F.count("_setpos") == num_hashes).alias(out_col))
    )


def cms_build(df: DataFrame, key: Column, weight: Column, depth: int,
              width: int) -> DataFrame:
    """Count-min sketch as a SPARSE counter table ``j | pos | cnt``
    (row j of the d x w matrix; zero cells omitted). ``weight`` is the
    per-input-row count to add (pass ``F.lit(1)`` for raw occurrence
    streams, or pre-aggregated per-key counts — same sketch, one
    combine earlier).

    Mergeable: two sketches with identical (depth, width) merge by
    ``groupBy(j, pos).sum(cnt)``. Output is <= depth x width rows, so
    the groupBy's map-side combine bounds the shuffle no matter how
    large the input."""
    probes = km_positions(F.xxhash64(key), width, depth)
    return (
        df.select(F.posexplode(probes).alias("j", "pos"), weight.alias("_w"))
        .groupBy("j", "pos")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(keys: DataFrame, counters: DataFrame, key: Column,
                 depth: int, width: int,
                 out_col: str = "cms_est") -> DataFrame:
    """Append ``out_col``: the count-min estimate (min over the d probe
    cells) for each row of ``keys``. The counter table (<= d x w rows)
    is broadcast; absent cells read as 0. ``keys`` rows must be
    distinct (re-grouped on all columns, as in bloom_might_contain)."""
    probe = keys.select(
        "*", F.posexplode(km_positions(F.xxhash64(key), width, depth))
        .alias("_j", "_pos"))
    ctr = F.broadcast(counters.select(
        F.col("j").alias("_cj"), F.col("pos").alias("_cpos"),
        F.col("cnt").alias("_cnt")))
    return (
        probe.join(ctr, (probe["_j"] == ctr["_cj"])
                   & (probe["_pos"] == ctr["_cpos"]), "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce("_cnt", F.lit(0))).alias(out_col))
    )

"""Deterministic dataset splitting & sampling (training-data surface).

A training-data pipeline needs splits that are (a) deterministic
across runs and cluster sizes, (b) assigned per-record with no
coordination, and (c) stable under re-ingestion (a re-crawled doc
lands in the same split). ``randomSplit`` gives none of these — it
depends on partitioning. The Spark-native answer is HASH-BUCKET
assignment: bucket = pmod(xxhash64(stable_key), granularity); split
boundaries are cumulative-fraction cuts over the bucket space. Pure
codegen'd expressions — assignment is a projection, zero shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRANULARITY = 10_000


def split_column(key: Column, fractions: Mapping[str, float],
                 seed: int = 0) -> Column:
    """CASE expression assigning a split name by hashed key bucket.

    ``fractions`` maps split name -> fraction; must sum to <= 1.0
    (any remainder becomes NULL — useful for subsampled corpora).
    Iteration order of ``fractions`` fixes the bucket ranges, so use
    a deterministic ordering (dicts preserve insertion order).
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(GRANULARITY))
    expr = None
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        cond = (bucket >= int(round(lo * GRANULARITY))) & \
               (bucket < int(round(hi * GRANULARITY)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr


def deterministic_split(df: DataFrame, key_col: str,
                        fractions: Mapping[str, float],
                        seed: int = 0,
                        split_col_name: str = "split") -> DataFrame:
    """Attach a ``split`` column ('train'/'val'/... per ``fractions``).

    Stability contract: the assignment depends only on (key value,
    seed, fractions) — never on row order, partition count, or
    cluster size; re-runs and incremental ingests agree byte-for-byte.
    """
    return df.withColumn(split_col_name,
                         split_column(F.col(key_col), fractions, seed))


def stratified_downsample(df: DataFrame, class_col: str, key_col: str,
                          max_class_fraction: float,
                          seed: int = 0) -> DataFrame:
    """Deterministically cap any class's share of the corpus at
    ``max_class_fraction`` (data-mix rebalancing: stop one dominant
    language/source from swamping a training mix).

    Per-class keep-fractions are derived from class counts (one tiny
    agg collect — #classes rows, the only driver data); rows are then
    kept by the same hash-bucket rule as deterministic_split, so the
    SAMPLE IS STABLE: the same row survives across runs and
    partitionings, and when new data shifts a class's keep-fraction,
    only keys at the moving bucket threshold change state — never an
    arbitrary reshuffle of the whole sample.
    """
    if not 0.0 < max_class_fraction <= 1.0:
        raise ValueError(f"max_class_fraction must be in (0, 1], got "
                         f"{max_class_fraction}")
    counts = {r[0]: r[1] for r in
              df.groupBy(class_col).agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    cap = max_class_fraction * total
    keep_frac = {cls: min(1.0, cap / n) for cls, n in counts.items()}

    spark = df.sparkSession
    # Null-safe class join (round-4 ADVICE): a NULL class is a real
    # group with its own keep-fraction, not silently dropped rows.
    frac_df = F.broadcast(spark.createDataFrame(
        [(cls, f) for cls, f in keep_frac.items()],
        "_cls string, _keep_frac double"))
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                    F.lit(GRANULARITY))
    return (
        df.join(frac_df, F.col(class_col).eqNullSafe(F.col("_cls")))
        .filter(bucket < (F.col("_keep_frac") * GRANULARITY).cast("long"))
        .drop("_cls", "_keep_frac")
    )

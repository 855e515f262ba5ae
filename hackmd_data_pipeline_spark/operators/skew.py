"""Skew-mitigation operators (100 TB posture; SURVEY.md §7).

Hot keys break hash-partitioned shuffles: one reducer gets the whale
key while the rest idle. Two standard remedies, both pure DataFrame
compositions:

  * salted_agg — two-phase aggregation: explode the key space with a
    random-ish salt, partial-aggregate on (key, salt), then final-
    aggregate on key. The first shuffle spreads the whale across
    ``buckets`` reducers; the second moves only ``buckets`` rows per
    key. Works for any algebraic aggregate (sum/count/min/max —
    supply the merge expressions).
  * salted_join — replicate the small side ``buckets`` times, salt the
    big side, equi-join on (key, salt): the whale key's rows spread
    over ``buckets`` tasks. (AQE's skewJoin does this adaptively at
    runtime — spark.sql.adaptive.skewJoin.enabled is on in
    session.get_spark — so reach for the manual form only when AQE
    can't see the skew, e.g. pre-shuffle aggregation states.)

The salt is ``pmod(hash(unique_col), buckets)`` when a unique column
is available (deterministic, testable) else ``floor(rand(seed) *
buckets)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: Sequence[str],
               partial_aggs: Sequence[Column], final_aggs: Sequence[Column],
               buckets: int = 16, salt_source: str | None = None,
               seed: int = 42) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate raw rows within (key, salt); per-phase
    output columns must carry names the ``final_aggs`` merge on key.
    Example::

        salted_agg(
            li, ["l_returnflag"],
            partial_aggs=[F.sum("l_quantity").alias("_s"),
                          F.count("*").alias("_c")],
            final_aggs=[F.sum("_s").alias("sum_qty"),
                        F.sum("_c").alias("n_rows")])
    """
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(buckets))
        if salt_source is not None
        else F.floor(F.rand(seed) * buckets).cast("int")
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(big: DataFrame, small: DataFrame, on: str,
                buckets: int = 8, salt_source: str | None = None,
                seed: int = 42) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    per salt bucket, join on (key, salt). Output columns = big's then
    small's (minus the duplicate key)."""
    salt = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(buckets))
        if salt_source is not None
        else F.floor(F.rand(seed) * buckets).cast("int")
    )
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    joined = b.join(s, [on, "_salt"])
    return joined.drop("_salt")

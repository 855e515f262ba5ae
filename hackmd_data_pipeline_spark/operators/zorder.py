"""Z-order (Morton curve) multi-column layout for scan pruning.

Parquet row-group min/max skipping only works on columns the data is
clustered by. A single sort key clusters ONE column; interleaving the
bits of several columns' bucket ranks clusters ALL of them at once —
a range predicate on ANY of the z-ordered columns then prunes most
row groups (the Delta/Iceberg OPTIMIZE ZORDER idea, built here from
plain Spark expressions; same family as the round-1 sorted-write +
row-group-stats work in sources/writers.py).

Everything is whole-stage-codegen'd column arithmetic: bucketing is a
min/max linear scale (one bounded stats agg), interleaving is
``bits x ncols`` shift-or terms. At 100 TB the stats agg is one scan
column-pruned to the z-columns, and the clustered write is one range
shuffle — the pruning it buys every later scan amortizes both.
(Min-max bucketing degrades under heavy skew; swapping in
percentile cut points — the customer_rfm_segments pattern — keeps
the same interleave. Documented, not built: the synthetic columns
are near-uniform.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton-interleaved key over ``cols`` (numeric), bucketed to
    ``bits`` bits each via min-max scaling. One bounded stats collect
    (2 x ncols scalars); the key itself is pure codegen arithmetic."""
    stats = df.agg(*[f(c).alias(f"{tag}_{c}") for c in cols
                     for tag, f in (("mn", F.min), ("mx", F.max))]).collect()[0]
    n_buckets = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn = float(stats[f"mn_{c}"])
        mx = float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.lit(n_buckets),
            F.greatest(F.lit(0), F.floor(
                (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
                * F.lit(n_buckets)).cast("long")))
        for i in range(bits):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * len(cols) + j)
    return key


def write_zordered(df: DataFrame, dest: str, cols: list[str],
                   bits: int = 12, num_files: int = 8) -> None:
    """Write ``df`` clustered on the Morton curve of ``cols``:
    range-repartition on the z-key (so files cover disjoint curve
    segments) and sort within partitions (so ROW GROUPS inside each
    file are tight too — the writer preserves task order when the
    input is already sorted by the partition expressions, the round-1
    writer-ordering lesson)."""
    keyed = df.withColumn("_zkey", zorder_key(df, cols, bits))
    (keyed.repartitionByRange(num_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(dest))


def rowgroup_skip_fraction(path: str, col: str, lo: float, hi: float) -> float:
    """Fraction of parquet row groups a [lo, hi] range predicate on
    ``col`` can skip, judged from footer min/max stats alone — the
    same decision a scan makes. Driver-side metadata read (footers
    only, no data)."""
    import pyarrow.parquet as pq
    from pathlib import Path

    total = skipped = 0
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and (st.max < lo or st.min > hi):
                skipped += 1
    return skipped / max(total, 1)

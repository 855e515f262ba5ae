"""SCD2 upsert (MERGE INTO emulation) — the reference's history-table
semantics made queryable.

The reference keeps every ETL touch in an append-only history table
with operation_type tags (reference create_table.sql:84-105, rows
built at arxiv_etl.py:88-111) but offers no way to ask "what did row
K look like at time T". SCD2 is that structure: each key holds
versioned rows with [valid_from, valid_to) ranges, current rows have
valid_to = NULL. Without a lakehouse MERGE INTO, vanilla Spark
emulates the upsert with joins + union (the CDC pattern):

  unchanged        : current rows whose key has no incoming update
  closed-out       : current rows whose key HAS a changed update —
                     valid_to set to the update's timestamp
  new version      : the changed/inserted rows, valid_from = ts
  no-op            : updates identical to the current row are dropped
                     (idempotent re-application)

Everything is keyed equi-joins — one shuffle alignment on the key,
no row-by-row driver logic; the full-table rewrite is the price of
plain parquet and is noted as the lakehouse-format trade-off in
SCALE.md.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(table: DataFrame, updates: DataFrame, key_cols: Sequence[str],
               compare_cols: Sequence[str], ts_col: str = "effective_ts",
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Apply ``updates`` (key cols + compare cols + ts_col) to an SCD2
    ``table`` (key + compare + valid_from/valid_to); returns the new
    full SCD2 table. History rows (valid_to != NULL) pass through
    untouched; identical updates are no-ops.

    A batch may carry several rows per key: updates are first
    collapsed to the LATEST row per key by ``ts_col`` (ties broken by
    the compare columns for determinism) — otherwise two open
    versions of one key would both land with valid_to = NULL,
    breaking the one-current-row-per-key invariant. Intermediate
    versions inside a single batch are intentionally not materialized
    (same as a MERGE applied once per batch).
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    latest = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc_nulls_last() for c in compare_cols])
    updates = (updates
               .withColumn("_rn", F.row_number().over(latest))
               .filter(F.col("_rn") == 1).drop("_rn"))
    history = table.filter(F.col(valid_to).isNotNull())
    current = table.filter(F.col(valid_to).isNull())

    # changed = incoming rows that differ from the current version on
    # any compare column (or are brand-new keys)
    cmp_cond = None
    for c in compare_cols:
        ne = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
        cmp_cond = ne if cmp_cond is None else (cmp_cond | ne)
    joined = updates.alias("upd").join(
        current.alias("cur"), keys, "left")
    changed = joined.filter(
        F.col(f"cur.{valid_from}").isNull() | cmp_cond)

    new_versions = changed.select(
        *keys,
        *[F.col(f"upd.{c}").alias(c) for c in compare_cols],
        F.col(f"upd.{ts_col}").alias(valid_from),
        F.lit(None).cast(table.schema[valid_to].dataType).alias(valid_to),
    )
    changed_keys = changed.select(
        *keys, F.col(f"upd.{ts_col}").alias("_close_ts"))
    closed = (
        current.join(F.broadcast(changed_keys), keys, "inner")
        .select(*keys, *compare_cols, valid_from,
                F.col("_close_ts").alias(valid_to))
    )
    unchanged = current.join(changed_keys, keys, "left_anti")
    return history.unionByName(closed).unionByName(unchanged) \
                  .unionByName(new_versions)


def snapshot_at(table: DataFrame, ts, key_cols: Sequence[str],
                valid_from: str = "valid_from",
                valid_to: str = "valid_to") -> DataFrame:
    """Point-in-time view: the version of each key valid at ``ts``."""
    return table.filter(
        (F.col(valid_from) <= ts)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > ts)))

"""Work-queue / control-plane queries (SURVEY.md §2.E, O-24..O-28;
the pending/failed status equality filters are O-18).

The reference's state machine lives in Postgres control tables
(raw_batches etc., reference create_table.sql:8-18) mutated with
row-locking UPDATEs. The Spark-native restructuring keeps control
state in small DataFrames rewritten wholesale (streaming/control.py
owns the stateful loop); the *relational semantics* of each verb —
claim = filter+order+limit, status update = keyed join + CASE,
dead-letter = predicate split — are registered here as oracle-checked
queries over a control table derived deterministically from `events`
(one batch per event_type x day, status cycled by day % 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query

# Shared derivation of the synthetic raw_batches control table.
_BATCHES_SQL = """
    SELECT event_type || '_' || strftime(CAST(ts AS DATE), '%Y-%m-%d') || '_batch' AS batch_id,
           event_type                                                   AS category,
           'raw/' || event_type || '/' || strftime(CAST(ts AS DATE), '%Y-%m-%d')
                  || '/part.jsonl.gz'                                   AS s3_path,
           COUNT(*)                                                     AS record_count,
           CASE CAST(EXTRACT(day FROM ts) AS INT) % 4
                WHEN 0 THEN 'pending' WHEN 1 THEN 'processing'
                WHEN 2 THEN 'finished' ELSE 'failed' END                AS etl_status
    FROM events
    GROUP BY 1, 2, 3, 5
"""


def _derive_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> raw_batches-shaped control table (deterministic)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.col("ts"), "yyyy-MM-dd")
    return (
        ev.groupBy(
            F.concat(F.col("event_type"), F.lit("_"), day, F.lit("_batch")).alias("batch_id"),
            F.col("event_type").alias("category"),
            F.concat(F.lit("raw/"), F.col("event_type"), F.lit("/"), day,
                     F.lit("/part.jsonl.gz")).alias("s3_path"),
            (F.dayofmonth("ts") % 4).alias("_cycle"),
        )
        .agg(F.count("*").alias("record_count"))
        .withColumn(
            "etl_status",
            F.when(F.col("_cycle") == 0, "pending")
            .when(F.col("_cycle") == 1, "processing")
            .when(F.col("_cycle") == 2, "finished")
            .otherwise("failed"),
        )
        .drop("_cycle")
    )


@query(
    "ctl_claim_pending",
    oracle=f"""
    WITH raw_batches AS ({_BATCHES_SQL})
    SELECT batch_id, category, s3_path, record_count
    FROM raw_batches
    WHERE etl_status = 'pending'
    ORDER BY batch_id
    LIMIT 5
    """,
)
def ctl_claim_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-24 claim, batch form: take-n oldest pending batches (reference
    arxiv_etl.py:42-57 ``FOR UPDATE SKIP LOCKED``). Spark owns all
    parallelism, so the lock disappears: single-driver filter + order
    + limit (TakeOrderedAndProject — no global sort); the streaming
    claim (exactly-once file tracking) lives in streaming/control.py."""
    b = _derive_batches(spark, sf_dir)
    return (
        b.filter(F.col("etl_status") == "pending")
        .select("batch_id", "category", "s3_path", "record_count")
        .orderBy("batch_id")
        .limit(5)
    )


@query(
    "ctl_status_update",
    oracle=f"""
    WITH raw_batches AS ({_BATCHES_SQL}),
    claimed AS (
        SELECT batch_id FROM raw_batches
        WHERE etl_status = 'pending' ORDER BY batch_id LIMIT 5
    )
    SELECT b.batch_id,
           CASE WHEN c.batch_id IS NOT NULL THEN 'processing' ELSE b.etl_status END AS status_after,
           CASE WHEN c.batch_id IS NOT NULL
                THEN TIMESTAMP '2024-02-01 00:00:00' END AS etl_started_at
    FROM raw_batches b LEFT JOIN claimed c ON b.batch_id = c.batch_id
    ORDER BY b.batch_id
    """,
)
def ctl_status_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-25/O-26/O-27 keyed status update (reference arxiv_etl.py:126-136):
    control-table rewrite as left join + CASE — the claimed keys flip to
    'processing' with a started-at timestamp, everything else passes
    through (COALESCE-preserve semantics). The claimed side broadcasts."""
    b = _derive_batches(spark, sf_dir)
    claimed = (
        b.filter(F.col("etl_status") == "pending")
        .select("batch_id").orderBy("batch_id").limit(5)
        .withColumn("_claimed", F.lit(True))
    )
    return (
        b.join(F.broadcast(claimed), "batch_id", "left")
        .select(
            "batch_id",
            F.when(F.col("_claimed"), "processing").otherwise(F.col("etl_status")).alias("status_after"),
            F.when(F.col("_claimed"), F.lit("2024-02-01 00:00:00").cast("timestamp_ntz"))
            .alias("etl_started_at"),
        )
        .orderBy("batch_id")
    )


@query(
    "ctl_dead_letter",
    oracle=f"""
    WITH raw_batches AS ({_BATCHES_SQL})
    SELECT category,
           COUNT(*)                    AS n_failed,
           CAST(SUM(record_count) AS BIGINT) AS records_quarantined
    FROM raw_batches
    WHERE etl_status = 'failed'
    GROUP BY category
    ORDER BY category
    """,
)
def ctl_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-28 dead-letter accounting (reference arxiv_etl.py:113-124,
    193-195): quarantined volume per category. The ingest-side twin
    (corrupt-record split) is sources/jsonl_gz.py."""
    b = _derive_batches(spark, sf_dir)
    return (
        b.filter(F.col("etl_status") == "failed")
        .groupBy("category")
        .agg(F.count("*").alias("n_failed"),
             F.sum("record_count").cast("long").alias("records_quarantined"))
        .orderBy("category")
    )

"""Explicit schemas — the engine never relies on inference (SURVEY.md §1.3).

Three families:
  * TPCH_SCHEMAS      — the driver's synthetic test tables (TESTDATA.md)
  * RAW_RECORD_SCHEMA — the ingest wire format (one JSON object per line,
    jsonl.gz), field set from reference src/extract/arxiv_collector.py:265-276
  * PAPER_SCHEMA / HISTORY_SCHEMA / control tables — the canonical data
    model from reference src/utils/initial/create_table.sql:8-105
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- test tables

TPCH_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TABLE_NAMES = tuple(TPCH_SCHEMAS)

# ------------------------------------------------------------- ingest model

# Wire format produced by the collector (reference arxiv_collector.py:265-276):
# timestamps travel as ISO-8601 strings, arrays as JSON arrays.
RAW_RECORD_SCHEMA = T.StructType([
    T.StructField("entry_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("authors", T.ArrayType(T.StringType())),
    T.StructField("summary", T.StringType()),
    T.StructField("primary_category", T.StringType()),
    T.StructField("categories", T.ArrayType(T.StringType())),
    T.StructField("published", T.StringType()),
    T.StructField("updated", T.StringType()),
    T.StructField("journal_ref", T.StringType()),
    T.StructField("doi", T.StringType()),
    # PERMISSIVE-mode quarantine column (reference's row-by-row salvage,
    # arxiv_etl.py:113-124, re-expressed as a corrupt-record split)
    T.StructField("_corrupt_record", T.StringType()),
])

# Canonical fact table (reference create_table.sql:53-73).
PAPER_SCHEMA = T.StructType([
    T.StructField("entry_id", T.StringType(), False),
    T.StructField("title", T.StringType()),
    T.StructField("authors", T.ArrayType(T.StringType())),
    T.StructField("affiliations", T.MapType(T.StringType(), T.StringType())),
    T.StructField("summary", T.StringType()),
    T.StructField("primary_category", T.StringType()),
    T.StructField("categories", T.ArrayType(T.StringType())),
    T.StructField("published", T.TimestampType()),
    T.StructField("updated", T.TimestampType()),
    T.StructField("journal_ref", T.StringType()),
    T.StructField("doi", T.StringType()),
    T.StructField("links", T.MapType(T.StringType(), T.StringType())),
    T.StructField("published_date", T.DateType()),
    T.StructField("updated_date", T.DateType()),
    T.StructField("etl_timestamp", T.TimestampType()),
    T.StructField("version", T.IntegerType()),
    T.StructField("keywords", T.ArrayType(T.StringType())),
    T.StructField("topic", T.StringType()),
    T.StructField("s3_path", T.StringType()),
])

# Append-only audit log (reference create_table.sql:84-105).
HISTORY_SCHEMA = T.StructType(
    [T.StructField("history_id", T.StringType(), False)]
    + [f for f in PAPER_SCHEMA.fields
       if f.name not in ("published_date", "updated_date", "version")]
    + [
        T.StructField("version", T.LongType()),       # epoch seconds (arxiv_etl.py:93)
        T.StructField("etl_stage", T.StringType()),
        T.StructField("operation_type", T.StringType()),  # insert|update|delete
    ]
)

# ------------------------------------------------------- control-plane model

# File-level work queue (reference create_table.sql:8-18).
RAW_BATCHES_SCHEMA = T.StructType([
    T.StructField("batch_id", T.StringType(), False),
    T.StructField("category", T.StringType()),
    T.StructField("s3_path", T.StringType()),
    T.StructField("record_count", T.IntegerType()),
    T.StructField("downloaded_at", T.TimestampType()),
    T.StructField("etl_status", T.StringType()),      # pending|processing|finished|failed
    T.StructField("etl_started_at", T.TimestampType()),
    T.StructField("etl_finished_at", T.TimestampType()),
    T.StructField("error_msg", T.StringType()),
])

# Per-paper state (reference create_table.sql:21-34).
DOWNLOADED_PAPERS_SCHEMA = T.StructType([
    T.StructField("entry_id", T.StringType(), False),
    T.StructField("category", T.StringType()),
    T.StructField("status", T.StringType()),          # pending|uploaded|failed
    T.StructField("last_attempt", T.TimestampType()),
    T.StructField("error_msg", T.StringType()),
    T.StructField("etl_status", T.StringType()),
    T.StructField("etl_batch_id", T.StringType()),
    T.StructField("etl_processed_at", T.TimestampType()),
])

# Per-category progress (reference create_table.sql:37-41).
CATEGORY_PROGRESS_SCHEMA = T.StructType([
    T.StructField("category_name", T.StringType(), False),
    T.StructField("status", T.StringType()),          # ''|Finished
    T.StructField("updated_at", T.TimestampType()),
])

# Per-category run stats (reference create_table.sql:44-50).
CATEGORY_RUN_STATS_SCHEMA = T.StructType([
    T.StructField("category_name", T.StringType(), False),
    T.StructField("time_sec", T.DoubleType()),
    T.StructField("s3_count", T.IntegerType()),
    T.StructField("pg_count", T.IntegerType()),
    T.StructField("updated_at", T.TimestampType()),
])

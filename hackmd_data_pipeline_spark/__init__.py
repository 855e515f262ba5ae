"""hackmd_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline (hank2636/hackmd-data-pipeline)
on Apache Spark: DataFrame/SQL-first, Catalyst-optimized, designed for
multi-executor 100 TB scale while tested on local mode.

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow)
    schemas.py    explicit StructTypes (never infer)
    tables.py     test-table loader / temp-view registry
    functions/    scalar column functions (key sanitize, scrub, ids)
    operators/    relational + extension operators (dedup, similarity,
                  text stats, top-k, multimodal plumbing)
    sources/      gzip-JSONL ingest with quarantine, parquet writers
    plans/        named query builders + DuckDB oracle SQL registry
    streaming/    control tables, work-queue semantics, streaming ingest
"""

__version__ = "0.1.0"

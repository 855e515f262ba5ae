"""Public engine facade — the reference's query entry points, Spark-first.

The reference exposes exactly two query surfaces (SURVEY.md §3.3):
literal SQL strings executed by PostgreSQL through a thin psycopg2
wrapper (reference src/core/pg_engine.py:56-122), and Python-side row
pipelines. Here both collapse into one object:

  * ``Engine.sql(text)`` — ANSI SQL over the canonical tables,
    registered as temp views; parsing/optimization/execution belong to
    Catalyst exactly as they belonged to PostgreSQL.
  * ``Engine.query(name)`` — every named operator from the registry
    (SURVEY.md §2 inventory + north-star extensions) as a DataFrame.

Unlike pg_engine's connection-per-statement teardown (pg_engine.py:
77,99,122), the SparkSession is long-lived by design; statement-level
atomicity maps to Spark's job-level output commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans import REGISTRY
from .tables import DEFAULT_SF_DIR, load_tables


class Engine:
    """One SparkSession + one data root = one queryable engine."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = load_tables(spark, sf_dir)  # registers temp views

    def sql(self, text: str) -> DataFrame:
        """Run ANSI SQL against the registered table views (the
        reference's execute_query surface, minus the DB-API plumbing)."""
        return self.spark.sql(text)

    def query(self, name: str) -> DataFrame:
        """Run a registered named operator (SURVEY.md §2 id families)."""
        return REGISTRY[name].builder(self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        return sorted(REGISTRY)

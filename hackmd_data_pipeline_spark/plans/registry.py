"""Named-query registry.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) is registered here as a ``Query``: a Spark DataFrame
builder ``(spark, sf_dir) -> DataFrame`` and, where the semantics are
ANSI-SQL-expressible, the equivalent DuckDB oracle SQL. The driver
contract (__spark_entry__.py) is a thin view over this registry.

Hash-match discipline: every computed column is aliased identically in
the Spark builder and the oracle SQL; float aggregates are rounded the
same on both sides; ordering ties are always broken by a key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator registering a builder under ``name`` with its oracle."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle,
                               doc=(fn.__doc__ or "").strip())
        return fn

    return deco

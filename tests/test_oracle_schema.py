"""Oracle result-schema guard: every DuckDB oracle must emit only
driver-canonicalizer-safe column types.

Round-2 verdict root cause: DuckDB returns HUGEINT (int128) for
``SUM(CASE WHEN ... THEN 1 END)`` over integers; the driver
materializes the oracle result through pandas, where HUGEINT becomes
float/object and the value hash diverges from Spark's int64 — four
queries failed hash-match while being value-identical. Round 1 hit the
same class with LIST cells crashing the canonicalizer.

This test runs each oracle at sf0.001 and asserts the result schema
contains no HUGEINT / UHUGEINT and no nested (LIST/STRUCT/MAP) types,
so the whole bug class is caught at commit time instead of in a driver
round. Ref: reference repo has no analytics oracles — this guards OUR
gate contract (SURVEY.md §6).
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# Types pandas cannot hold losslessly in an int64/float64/object-stable
# column, or that the driver's value-hash canonicalizer chokes on.
_FORBIDDEN_SUBSTRINGS = ("HUGEINT", "UHUGEINT", "STRUCT", "MAP(", "UNION(")

# Positive contract: the full set of DuckDB result types the driver's
# canonicalizer is KNOWN to handle (every type below has appeared in a
# green driver row). Anything new — DECIMAL, INTERVAL, UUID, BLOB,
# TIME, enum, nested — must be explicitly cast in the oracle before it
# ships, so the allowlist fails closed on whole classes the denylist
# above has never seen.
_ALLOWED_TYPES = {"BIGINT", "BOOLEAN", "DATE", "DOUBLE", "FLOAT",
                  "INTEGER", "SMALLINT", "TINYINT", "TIMESTAMP",
                  "VARCHAR"}


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry_mod
    return entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_schema_is_canonicalizer_safe(duck_smoke, name):
    sql = _oracles()[name]
    rel = duck_smoke.sql(sql)
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        for bad in _FORBIDDEN_SUBSTRINGS:
            assert bad not in t, (
                f"oracle {name!r} column {col!r} has type {t} — the driver's "
                f"pandas canonicalizer mangles it; CAST it in the oracle SQL")
        # LIST types print as e.g. BIGINT[] — forbid any array suffix.
        assert "[]" not in t, (
            f"oracle {name!r} column {col!r} is a list type {t} — project "
            f"to scalars in the oracle SQL")
        assert t in _ALLOWED_TYPES, (
            f"oracle {name!r} column {col!r} has type {t}, outside the "
            f"driver-canonicalizer-proven allowlist {_ALLOWED_TYPES} — "
            f"CAST it in the oracle SQL")


def test_oracle_tokenizer_class_uniform():
    """Whitespace-tokenizer drift guard (the r04 dialect-sweep class):
    every regexp_split_to_array pattern in every registered oracle
    must be exactly the canonical WS_CLASS — Java's \\s includes \\x0B
    while RE2's does not, so any site quietly reverting to '\\s+' (or
    typo'ing the class) reopens a silent cross-engine divergence."""
    import re

    from hackmd_data_pipeline_spark.functions.scalars import WS_CLASS
    from hackmd_data_pipeline_spark.plans import REGISTRY

    n_checked = 0
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        for pat in re.findall(
                r"regexp_split_to_array\([^,]+,\s*'([^']+)'", q.oracle):
            assert pat == WS_CLASS, (
                f"{name}'s oracle tokenizes with {pat!r}, not the "
                f"canonical {WS_CLASS!r}")
            n_checked += 1
        assert r"'\s+'" not in q.oracle, (
            f"{name}'s oracle still uses the divergent \\s+ split")
    assert n_checked >= 25  # the tokenizer family really is covered

"""Scalar column functions (SURVEY.md §2.B, O-12..O-16).

All are pure Column expressions — JVM-side, whole-stage-codegen'd, no
Python UDFs — so they stay on the fast path at any scale and remain
expressible in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Control characters the reference scrubs out of summaries
# (reference src/etl/arxiv_etl.py:89: \x00, \n, \r -> space).
_SCRUB_PATTERN = "[\\x00\\n\\r]"


def scrub_text(col: Column | str) -> Column:
    """O-12 summary scrub: control chars -> single space."""
    return F.regexp_replace(col, _SCRUB_PATTERN, " ")


def sanitize_key(col: Column | str) -> Column:
    """O-14 key sanitization: '.' -> '_' (reference arxiv_collector.py:175)."""
    return F.translate(F.col(col) if isinstance(col, str) else col, ".", "_")


def batch_id(category: Column | str, date: Column | str, n: Column | str) -> Column:
    """O-15 deterministic composite batch id: ``{cat}_{date}_batch_{n}``
    (reference arxiv_collector.py:281)."""
    cat = F.col(category) if isinstance(category, str) else category
    d = F.col(date) if isinstance(date, str) else date
    num = F.col(n) if isinstance(n, str) else n
    return F.concat_ws("_", cat, d.cast("string"), F.lit("batch"), num.cast("string"))


# THE canonical whitespace-tokenizer class — identical byte-for-byte
# in Java regex (Spark) and RE2 (DuckDB oracles): Java's \s includes
# \x0B, RE2's does not, so \s must never be used for tokenization.
# Every tokenizer split in the engine AND every oracle must use this
# exact class; tests/test_oracle_schema.py scans the registry for
# drift.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of non-empty text -> array<string>."""
    return F.split(F.trim(col if isinstance(col, Column) else F.col(col)),
                   WS_CLASS)


def token_count(col: Column | str) -> Column:
    """Token count; 0 for null/blank text."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.when(F.length(F.trim(c)) > 0, F.size(tokens(c))).otherwise(F.lit(0))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of casefolded, trimmed text.

    md5 (not xxhash64) so the DuckDB oracle can reproduce it.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return F.md5(F.lower(F.trim(c)))


def elapsed_micros(max_ts: Column, min_ts: Column) -> Column:
    """Exact elapsed microseconds between two timestamps (integer math —
    no float drift in oracle comparison). timestamp_diff works on
    TIMESTAMP_NTZ directly and is session-timezone-independent."""
    return F.timestamp_diff("MICROSECOND", min_ts, max_ts)

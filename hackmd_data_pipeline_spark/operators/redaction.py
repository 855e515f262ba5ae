"""Pattern-driven PII / sensitive-term redaction.

The curation step every shipped training corpus runs before packing:
emails, phone numbers, IP addresses, national-id shapes, and a
configurable sensitive-term list are replaced with typed tags, and the
per-document hit counts are reported so downstream filters can drop
documents whose PII density is too high to salvage.

Design (100 TB posture): the whole scrub is ONE narrow codegen'd
projection — a chain of ``regexp_replace`` plus per-pattern
``regexp_count`` on the original text. Zero shuffles, zero UDFs, zero
driver participation; Tungsten evaluates the regex chain per row
inside whole-stage codegen, so the operator scales with scan
bandwidth exactly like a filter.

Engine parity: every default pattern is written in the common
Java-regex / RE2 dialect subset (no backrefs, no lookaround), so the
same pattern text drives Spark's ``regexp_replace``/``regexp_count``
and DuckDB's ``regexp_replace(..., 'g')``/``regexp_extract_all`` —
the DuckDB oracle is generated from the SAME pattern table
(:func:`pii_scrub_oracle_sql`), keeping one source of truth.

Counts are measured on the ORIGINAL text per pattern (independent,
order-free); the scrub itself applies sequentially in table order, so
an email swallowed into ``<EMAIL>`` no longer triggers the phone
pattern in the scrubbed output. Both engines implement the identical
two-phase contract.

Reference anchor: the reference pipeline stores raw abstracts verbatim
(reference src/extract/arxiv_collector.py:123-134 writes the API
payload as-is); redaction is part of the LLM-training-data extension
surface (north-star spec), not a reference port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (tag, pattern, replacement) — pattern text valid and equivalent in
# Java regex AND RE2. Order matters for the sequential scrub phase:
# most-specific first so composite shapes (an email's host, an SSN's
# digit groups) are consumed before the broader digit patterns see
# them.
REDACTION_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9\- ]{7,}[0-9]", "<PHONE>"),
    # Deployment-specific sensitive-term list (names, project
    # codewords, credentials). The default redacts two terms that DO
    # occur in the synthetic corpus so the oracle check exercises real
    # replacements, not just zero-hit parity.
    ("term", r"\b(?:customer|key)\b", "<TERM>"),
)


def scrub_expr(text_col: str | Column,
               patterns: tuple[tuple[str, str, str], ...] = REDACTION_PATTERNS,
               ) -> Column:
    """The scrubbed-text expression: sequential ``regexp_replace``
    chain in pattern-table order."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _tag, pat, rep in patterns:
        col = F.regexp_replace(col, pat, rep)
    return col


def scrub_documents(df: DataFrame, text_col: str = "text",
                    patterns: tuple[tuple[str, str, str], ...] =
                    REDACTION_PATTERNS) -> DataFrame:
    """Per-document redaction report + scrubbed-text digest.

    Returns one row per input row: per-pattern hit counts (measured on
    the original text), the total, and md5/length of the scrubbed text
    (the digest keeps the oracle row narrow — shipping the scrubbed
    body itself is a ``select`` away via :func:`scrub_expr`)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{tag}")
        for tag, pat, _rep in patterns
    ]
    total = None
    for tag, _pat, _rep in patterns:
        c = F.col(f"n_{tag}")
        total = c if total is None else total + c
    scrubbed = scrub_expr(text_col, patterns)
    return (
        df.select("*", *counts)
        .select(
            "*",
            total.alias("n_redactions"),
            F.md5(scrubbed).alias("scrubbed_md5"),
            F.length(scrubbed).alias("scrubbed_len"),
        )
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def pii_scrub_oracle_sql(patterns: tuple[tuple[str, str, str], ...] =
                         REDACTION_PATTERNS) -> str:
    """DuckDB restatement generated from the SAME pattern table:
    ``regexp_extract_all`` lengths for the counts, a nested
    ``regexp_replace(..., 'g')`` chain for the scrub."""
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, {_sql_quote(pat)})) AS INT) "
        f"AS n_{tag}"
        for tag, pat, _rep in patterns)
    total = " + ".join(f"n_{tag}" for tag, _pat, _rep in patterns)
    scrub = "text"
    for _tag, pat, rep in patterns:
        scrub = (f"regexp_replace({scrub}, {_sql_quote(pat)}, "
                 f"{_sql_quote(rep)}, 'g')")
    return f"""
    WITH c AS (
        SELECT doc_id,
           {counts},
           {scrub} AS scrubbed
        FROM documents
    )
    SELECT doc_id, n_email, n_ssn, n_ipv4, n_phone, n_term,
           CAST({total} AS INT)      AS n_redactions,
           md5(scrubbed)             AS scrubbed_md5,
           CAST(LENGTH(scrubbed) AS INT) AS scrubbed_len
    FROM c ORDER BY doc_id
    """

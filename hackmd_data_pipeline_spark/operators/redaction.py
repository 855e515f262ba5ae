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

Engine parity: every core pattern is written in the common
Java-regex / RE2 dialect subset (no backrefs, no lookaround).
Word boundaries are the one construct that CANNOT be shared verbatim:
Java's ``\\b`` is Unicode-aware (``é`` is a word char) while RE2's is
ASCII-only, so the same ``\\b`` text silently disagrees on multibyte
neighbors. Boundaries are therefore declared as a FLAG in the pattern
table and rendered per engine to the SAME zero-width ASCII-word
semantic — ``(?<![0-9A-Za-z_])``/``(?![0-9A-Za-z_])`` lookarounds for
Java (and python ``re``), bare ``\\b`` for RE2, where it means exactly
that. ASCII boundaries are the only semantic RE2 can express; the
over-match on multibyte neighbors (``ékey`` → term hit) errs toward
over-redaction, the safe direction for PII. The DuckDB oracle is
generated from the SAME pattern table (:func:`pii_scrub_oracle_sql`),
keeping one source of truth; cross-engine agreement on
boundary-adjacent multibyte text is pinned in
tests/test_redaction.py.

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

_WORD = "0-9A-Za-z_"

# (tag, core_pattern, replacement, bounded) — core patterns valid and
# equivalent in Java regex AND RE2; ``bounded`` asks for zero-width
# ASCII-word boundaries on both ends, rendered per engine. Order
# matters for the sequential scrub phase: most-specific first so
# composite shapes (an email's host, an SSN's digit groups) are
# consumed before the broader digit patterns see them.
REDACTION_PATTERNS: tuple[tuple[str, str, str, bool], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>", False),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>", True),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>", True),
    ("phone", r"\+?[0-9][0-9\- ]{7,}[0-9]", "<PHONE>", False),
    # Deployment-specific sensitive-term list (names, project
    # codewords, credentials). The default redacts two terms that DO
    # occur in the synthetic corpus so the oracle check exercises real
    # replacements, not just zero-hit parity.
    ("term", r"(?:customer|key)", "<TERM>", True),
)


def render_pattern(core: str, bounded: bool, engine: str) -> str:
    """Render a pattern-table row for one regex engine.

    ``engine``: ``"java"`` (Spark; also valid for python ``re``) or
    ``"re2"`` (DuckDB). Both renderings implement the identical
    zero-width ASCII-word boundary — Java via lookarounds (its ``\\b``
    is Unicode-aware, the wrong semantic here), RE2 via ``\\b`` (which
    IS the ASCII boundary, and RE2 has no lookaround).

    CONTRACT for ``bounded=True``: every match of ``core`` must START
    and END with an ASCII word character ``[0-9A-Za-z_]`` (true for
    the whole default battery). A core that can match from a non-word
    edge (e.g. ``#[0-9]{4}``) makes the two renderings DIVERGE — the
    Java lookbehind tests the char before the '#', RE2's ``\\b`` tests
    the word/non-word transition AT the '#' — so Spark and the
    generated oracle would disagree. Custom batteries must be run
    through :func:`validate_battery` (which probes both engines on
    caller texts) before being trusted; bounded cores with
    syntactically obvious non-word edges are rejected here outright."""
    if not bounded:
        return core
    if engine not in ("java", "re2"):
        raise ValueError(f"unknown engine: {engine!r}")
    # cheap static screen: strip grouping/alternation syntax at the
    # edges and reject cores whose first/last matchable char is an
    # obvious non-word literal. (Conservative — validate_battery is
    # the authoritative check for custom batteries.)
    import re as _re

    edge = _re.sub(r"^(\(\?:|\(|\[)*|(\)|\]|[+*?]|\{\d+(,\d*)?\})*$", "",
                   core)
    for ch in (edge[:1], edge[-1:]):
        if ch and ch in "#@.+- ,;:!$%^&*/\\|<>~`'\"":
            raise ValueError(
                f"bounded core {core!r} can match from a non-word edge "
                f"({ch!r}); the java/re2 boundary renderings diverge — "
                "use bounded=False and encode the boundary explicitly")
    if engine == "java":
        return f"(?<![{_WORD}])(?:{core})(?![{_WORD}])"
    return rf"\b(?:{core})\b"


def validate_battery(patterns: tuple[tuple[str, str, str, bool], ...],
                     probe_texts: list[str]) -> None:
    """Empirically verify a custom battery's cross-engine agreement:
    run the java rendering (python ``re`` shares Java's lookaround and
    ASCII-class semantics for these constructs) and the RE2 rendering
    (DuckDB) over ``probe_texts`` and raise if counts or scrubbed text
    disagree. The authoritative guard for bounded cores the static
    screen in :func:`render_pattern` can't judge."""
    import re as _re

    import duckdb

    con = duckdb.connect()
    for tag, pat, rep, bounded in patterns:
        jpat = render_pattern(pat, bounded, "java")
        rpat = render_pattern(pat, bounded, "re2")
        for t in probe_texts:
            jn = len(_re.findall(jpat, t))
            js = _re.sub(jpat, rep, t)
            rn, rs = con.execute(
                "SELECT len(regexp_extract_all(?, ?)), "
                "regexp_replace(?, ?, ?, 'g')",
                [t, rpat, t, rpat, rep]).fetchone()
            if (jn, js) != (rn, rs):
                raise ValueError(
                    f"pattern {tag!r} diverges across engines on "
                    f"{t!r}: java=({jn}, {js!r}) re2=({rn}, {rs!r})")


def scrub_expr(text_col: str | Column,
               patterns: tuple[tuple[str, str, str, bool], ...] =
               REDACTION_PATTERNS) -> Column:
    """The scrubbed-text expression: sequential ``regexp_replace``
    chain in pattern-table order."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for _tag, pat, rep, bounded in patterns:
        col = F.regexp_replace(col, render_pattern(pat, bounded, "java"), rep)
    return col


def scrub_documents(df: DataFrame, text_col: str = "text",
                    patterns: tuple[tuple[str, str, str, bool], ...] =
                    REDACTION_PATTERNS) -> DataFrame:
    """Per-document redaction report + scrubbed-text digest.

    Returns one row per input row: per-pattern hit counts (measured on
    the original text), the total, and md5/length of the scrubbed text
    (the digest keeps the oracle row narrow — shipping the scrubbed
    body itself is a ``select`` away via :func:`scrub_expr`)."""
    counts = [
        F.regexp_count(F.col(text_col),
                       F.lit(render_pattern(pat, bounded, "java")))
        .alias(f"n_{tag}")
        for tag, pat, _rep, bounded in patterns
    ]
    total = None
    for tag, _pat, _rep, _b in patterns:
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


def pii_scrub_oracle_sql(patterns: tuple[tuple[str, str, str, bool], ...] =
                         REDACTION_PATTERNS) -> str:
    """DuckDB restatement generated from the SAME pattern table:
    ``regexp_extract_all`` lengths for the counts, a nested
    ``regexp_replace(..., 'g')`` chain for the scrub. Every output
    column (including the count list) derives from the pattern table,
    so custom batteries generate valid SQL too."""
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, "
        f"{_sql_quote(render_pattern(pat, bounded, 're2'))})) AS INT) "
        f"AS n_{tag}"
        for tag, pat, _rep, bounded in patterns)
    count_cols = ", ".join(f"n_{tag}" for tag, _p, _r, _b in patterns)
    total = " + ".join(f"n_{tag}" for tag, _p, _r, _b in patterns)
    scrub = "text"
    for _tag, pat, rep, bounded in patterns:
        scrub = (f"regexp_replace({scrub}, "
                 f"{_sql_quote(render_pattern(pat, bounded, 're2'))}, "
                 f"{_sql_quote(rep)}, 'g')")
    return f"""
    WITH c AS (
        SELECT doc_id,
           {counts},
           {scrub} AS scrubbed
        FROM documents
    )
    SELECT doc_id, {count_cols},
           CAST({total} AS INT)      AS n_redactions,
           md5(scrubbed)             AS scrubbed_md5,
           CAST(LENGTH(scrubbed) AS INT) AS scrubbed_len
    FROM c ORDER BY doc_id
    """

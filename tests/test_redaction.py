"""operators/redaction.py — pattern battery on real PII shapes (the
synthetic corpus only exercises the term list) + the two-phase
count/scrub contract + Spark-vs-DuckDB parity on hostile text."""

import duckdb
import pytest
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.redaction import (
    REDACTION_PATTERNS,
    pii_scrub_oracle_sql,
    render_pattern,
    scrub_documents,
    scrub_expr,
)

DOCS = [
    (1, "contact alice.smith+spam@example.co.uk or bob@sub.domain.org now"),
    (2, "ssn 123-45-6789 and phone +1 555-867-5309 on file"),
    (3, "server 10.0.255.3 peered with 192.168.1.1"),
    (4, "customer key customer KEY Key"),  # term list is case-sensitive
    (5, "no sensitive content here"),
    (6, ""),
    (7, "call 555 123 4567 x 99"),  # digit-run phone shape
    (8, "v1.2.3.4 release notes"),  # ipv4 shape inside a version string
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in scrub_documents(df).collect()}


def test_email_variants(scrubbed):
    assert scrubbed[1]["n_email"] == 2
    assert scrubbed[1]["n_redactions"] == 2


def test_ssn_and_phone(scrubbed):
    assert scrubbed[2]["n_ssn"] == 1
    # the raw text also matches the phone shape twice (the SSN's digit
    # run and the actual phone) — counts are measured on the ORIGINAL
    # text, independently per pattern
    assert scrubbed[2]["n_phone"] == 2


def test_ipv4(scrubbed):
    assert scrubbed[3]["n_ipv4"] == 2
    # 'v1.2.3.4' has no word boundary between 'v' and '1' — the
    # version string is correctly NOT an IPv4 hit
    assert scrubbed[8]["n_ipv4"] == 0


def test_terms_case_sensitive(scrubbed):
    assert scrubbed[4]["n_term"] == 3  # customer, key, customer


def test_clean_and_empty(scrubbed):
    assert scrubbed[5]["n_redactions"] == 0
    assert scrubbed[6]["n_redactions"] == 0
    assert scrubbed[6]["scrubbed_len"] == 0


def test_sequential_scrub_consumes_earlier_matches(spark):
    """Phase 2 contract: the SSN is consumed by the <SSN> tag before
    the phone pattern sees the text, so the scrubbed body keeps the
    tag intact (no '<SS<PHONE>' mangling)."""
    df = spark.createDataFrame([(1, "id 123-45-6789 ok")],
                               "doc_id long, text string")
    out = df.select(scrub_expr("text").alias("s")).head()["s"]
    assert out == "id <SSN> ok"


def test_duckdb_parity_on_pii_shapes(spark):
    """The generated oracle and the Spark plan agree on text the
    synthetic corpus never shows the driver (every pattern firing,
    multibyte neighbors, adjacent matches)."""
    extra = [(9, "naïve@exämple.com café"),  # multibyte near an email
             (10, "a@b.cc c@d.dd"),          # adjacent matches
             (11, "key customer 1.2.3.4 555-867-5309 x 123-45-6789"),
             # multibyte letters DIRECTLY adjacent to bounded matches —
             # the case where Java \b (Unicode) and RE2 \b (ASCII)
             # disagree; the rendered zero-width ASCII boundaries must
             # agree across engines (over-redaction by design)
             (12, "ékey café123-45-6789 naïve1.2.3.4é customerè")]
    rows = DOCS + extra
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in scrub_documents(df)
        .select("doc_id", "n_email", "n_ssn", "n_ipv4", "n_phone", "n_term",
                "n_redactions", "scrubbed_md5", "scrubbed_len")
        .collect()
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: r[1:] for r in con.sql(pii_scrub_oracle_sql()).fetchall()}
    assert got == want


def test_custom_pattern_table(spark):
    """The engine is pattern-table-generic, not hardwired to the
    default battery."""
    import duckdb

    pats = (("num", r"[0-9]+", "<N>", False),)
    df = spark.createDataFrame([(1, "a1 b22 c")], "doc_id long, text string")
    row = scrub_documents(df, patterns=pats).head()
    assert row["n_num"] == 2 and row["n_redactions"] == 2
    assert df.select(
        scrub_expr("text", pats).alias("s")).head()["s"] == "a<N> b<N> c"
    assert len(REDACTION_PATTERNS) == 5

    # the generated oracle derives ALL columns from the custom table
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.sql("INSERT INTO documents VALUES (1, 'a1 b22 c')")
    got = con.sql(pii_scrub_oracle_sql(pats)).fetchall()
    assert got == [(1, 2, 2, row["scrubbed_md5"], row["scrubbed_len"])]


def test_scrub_matches_python_re_model(spark):
    """Property: the Spark (Java-regex) scrub and counts equal an
    independent Python ``re`` model on adversarial text — pins the
    common-dialect claim (the DuckDB parity test covers RE2; this
    covers the third engine). Deterministic corpus: hypothesis is
    overkill for a pure-function comparison over a fixed generator."""
    import itertools
    import re

    frags = ["a@b.co", "x", " ", ".", "-", "@", "12", "345-67-8901",
             "1.2.3.4", "customer", "key", "keys", "+1 23456789",
             "é", "@@", "a.b@c.dd e", "9"]
    texts = ["".join(p) for p in itertools.islice(
        itertools.permutations(frags, 3), 0, 600, 7)]
    texts += ["".join(f * 3 for f in frags), ""]

    def model(t):
        # python `re` shares Java's lookaround support, so the "java"
        # rendering is the correct one for the model
        counts = [len(re.findall(render_pattern(pat, b, "java"), t))
                  for _tag, pat, _rep, b in REDACTION_PATTERNS]
        s = t
        for _tag, pat, rep, b in REDACTION_PATTERNS:
            s = re.sub(render_pattern(pat, b, "java"), rep, s)
        return (*counts, s)

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_ssn"], r["n_ipv4"], r["n_phone"],
                      r["n_term"], r["s"])
        for r in scrub_documents(df)
        .withColumn("s", scrub_expr("text")).collect()
    }
    for i, t in rows:
        assert got[i] == model(t), (t, got[i], model(t))


def test_bounded_core_edge_contract():
    """The review's divergence case: a bounded core starting with a
    non-word char renders to OPPOSITE boundary semantics in java vs
    re2 — the static screen rejects it outright."""
    from hackmd_data_pipeline_spark.operators.redaction import (
        validate_battery,
    )

    with pytest.raises(ValueError, match="non-word edge"):
        render_pattern(r"#[0-9]{4}", True, "java")
    # the default battery passes both the static screen and the
    # empirical cross-engine probe on hostile boundary texts
    probes = ["x#1234", "ékey", "café123-45-6789", "a 1.2.3.4é b",
              "key keys customer", ""]
    validate_battery(REDACTION_PATTERNS, probes)
    # and validate_battery's empirical probe CATCHES a divergent core
    # the static screen cannot judge: the alternation's first/last
    # chars are word chars (passes the screen) but the '#2' branch
    # matches from a non-word edge
    sneaky = (("bad", r"a1|#2", "<B>", True),)
    render_pattern(r"a1|#2", True, "java")  # screen passes it
    with pytest.raises(ValueError, match="diverges across engines"):
        validate_battery(sneaky, ["x#2 y"])

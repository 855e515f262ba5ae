"""Bit-exactness of the DuckDB xxhash64 restatement
(plans/oracle_helpers.py) against Spark's own xxhash64.

The promoted docs_train_val_test_split oracle stands on this
equivalence: Spark computes pmod(xxhash64(doc_id, lit(seed)), g) via
XXH64.hashLong + hashInt; the oracle restates both in HUGEINT/UBIGINT
arithmetic. A single differing bit anywhere in the 64-bit pipeline
flips buckets, so the test sweeps a hostile domain: small ids, powers
of two, values straddling 2**31/2**32/2**63, negatives, and Long
min/max.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.plans.oracle_helpers import xxhash64_bucket_cte

HOSTILE_KEYS = sorted({
    0, 1, 2, 5, 7, 63, 64, 255, 9999, 123456789,
    2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**32 + 17,
    2**62, 2**63 - 1, -1, -2, -9999, -(2**31), -(2**63),
    10**12, 10**15, 31337,
})


@pytest.mark.parametrize("seed,granularity", [(0, 10_000), (7, 10_000),
                                              (0, 997), (12345, 64)])
def test_duckdb_xxhash64_bucket_matches_spark(spark, seed, granularity):
    df = spark.createDataFrame([(k,) for k in HOSTILE_KEYS], "k long")
    expected = {
        r.k: r.b for r in df.select(
            "k",
            F.pmod(F.xxhash64("k", F.lit(seed)), F.lit(granularity)).alias("b"),
        ).collect()
    }

    con = duckdb.connect(":memory:")
    vals = ", ".join(f"({k})" for k in sorted(HOSTILE_KEYS))
    sql = xxhash64_bucket_cte(
        key_col="k", seed=seed, granularity=granularity,
        source_sql=f"(SELECT * FROM (VALUES {vals}) AS t(k))",
        keep_cols="k",
    ) + "\nSELECT k, bucket FROM final ORDER BY k"
    got = dict(con.sql(sql).fetchall())
    assert got == expected


def test_duckdb_xxh64_string_matches_spark(spark):
    """Full-algorithm xxh64-over-VARCHAR (stripes, tail words, 4-byte
    chunk, trailing bytes): bit-exact vs Spark's xxhash64(string) over
    hostile lengths (0..80B, the 4/8/32-byte structure boundaries) and
    multibyte UTF-8."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.plans.oracle_helpers import (
        _signed,
        xxh64_string_ctes,
    )

    strs = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
            "abcdefgh", "abcdefghi", "hello world", "x" * 31, "x" * 32,
            "x" * 33, "y" * 39, "y" * 40, "z" * 63, "z" * 64, "z" * 65,
            "the quick brown fox jumps over the lazy dog",
            "日本語テキストです", "naïve café ブログ", "a b c " * 13,
            # stripes-heavy: hundreds of 32-byte stripes + ragged tails
            "qwerty uiop 0123456789 " * 40, "Z" * 1000, "Z" * 1001,
            ("мультибайтовый текст " * 30)[:500]]
    rows = [(i, s) for i, s in enumerate(strs)]

    df = spark.createDataFrame(rows, "rid long, s string")
    expected = {r.rid: r.h for r in
                df.select("rid", F.xxhash64("s").alias("h")).collect()}

    import duckdb
    con = duckdb.connect(":memory:")
    vals = ", ".join("(%d, '%s')" % (i, s.replace("'", "''"))
                     for i, s in rows)
    frag, out = xxh64_string_ctes("inp", "rid", "s")
    sql = (f"WITH inp(rid, s) AS (SELECT * FROM (VALUES {vals})), {frag} "
           f"SELECT rid, {_signed('h')} AS h FROM {out} ORDER BY rid")
    got = dict(con.sql(sql).fetchall())
    assert got == expected


def test_tokenizer_whitespace_class_parity(spark):
    """The explicit whitespace class [ \\t\\n\\x0B\\f\\r]+ (the r04
    sweep replacing \\s+) tokenizes IDENTICALLY in Spark/Java and
    DuckDB/RE2 on the characters where their \\s definitions diverge:
    Java \\s includes \\x0B (vertical tab), RE2's does not. NBSP and
    other Unicode spaces stay inside tokens on both engines."""
    from pyspark.sql import functions as F

    import duckdb

    texts = ["a\x0bb", "a\fb", "a\tb\nc\rd", "a b", "a  b",
             "\x0b\x0blead", "trail\x0b"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    spark_toks = {
        r["i"]: r["toks"]
        for r in df.select(
            "i", F.split(F.trim("t"), "[ \\t\\n\\x0B\\f\\r]+").alias("toks")
        ).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(
        "(%d, '%s')" % (i, t.replace("'", "''")) for i, t in enumerate(texts))
    duck_toks = dict(con.sql(
        f"SELECT i, regexp_split_to_array(TRIM(t), '[ \\t\\n\\x0B\\f\\r]+') "
        f"FROM (VALUES {vals}) v(i, t) ORDER BY i").fetchall())
    assert spark_toks == duck_toks
    # and the divergent char is actually exercised: \x0b splits
    assert spark_toks[0] == ["a", "b"]


def test_bpe_tokenizer_parity_on_whitespace(spark):
    """The BPE pre-tokenizer counts agree between Spark (Java regex)
    and DuckDB (RE2) on text containing real tabs/newlines/backslashes
    — the characters the old double-backslashed SQL rendering got
    wrong (RE2 saw escaped-backslash + literal letters, so real
    whitespace leaked into the punctuation-run branch)."""
    from pyspark.sql import functions as F

    import duckdb

    from hackmd_data_pipeline_spark.plans.textops import _BPE_RE, _BPE_RE_SQL

    texts = ["x \ty", "a\nb", "it's a\ttest", "back\\slash", "a\x0bb",
             "plain words here", "12,34\t!?"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", F.size(F.regexp_extract_all("t", F.lit(_BPE_RE), 0)).alias("n")
    ).collect()}
    con = duckdb.connect()
    # DuckDB standard strings keep backslashes literal — only quotes
    # need escaping, in the data AND in the pattern
    vals = ", ".join("(%d, '%s')" % (i, t.replace("'", "''"))
                     for i, t in enumerate(texts))
    want = dict(con.sql(
        f"SELECT i, len(regexp_extract_all(t, '{_BPE_RE_SQL}')) "
        f"FROM (VALUES {vals}) v(i, t) ORDER BY i").fetchall())
    assert got == want

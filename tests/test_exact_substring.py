"""operators/dedup.py::exact_substring_spans — planted verbatim spans,
exact union coverage, interval-merge edges, hash-vs-text grouping
parity (via the registered oracle's semantics restated in python)."""

import pytest

from hackmd_data_pipeline_spark.operators.dedup import exact_substring_spans

K = 8  # small k keeps fixtures readable; the operator is k-generic


def _words(tag, n):
    return " ".join(f"{tag}{j}" for j in range(n))


@pytest.fixture(scope="module")
def result(spark):
    shared = _words("s", 12)          # 12-token verbatim span (> k)
    shared2 = _words("z", 8)          # exactly k tokens
    docs = [
        # doc 1 and 2 share `shared` (12 tokens) verbatim
        (1, _words("a", 10) + " " + shared + " " + _words("b", 10)),
        (2, _words("c", 5) + " " + shared + " " + _words("d", 20)),
        # doc 3 shares two DISTINCT spans with 2 and 4, separated by
        # enough unique filler that the islands stay separate
        (3, shared2 + " " + _words("e", 20) + " " + _words("f", 9)),
        (4, _words("g", 10) + " " + _words("f", 9) + " " + _words("h", 5)),
        (5, shared2 + " " + _words("i", 15)),
        # doc 6: no duplicated content
        (6, _words("j", 40)),
        # doc 7: shorter than k -> windowless but still reported
        (7, "one two three"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in exact_substring_spans(df, k=K).collect()}


def test_every_nonempty_doc_reported(result):
    assert set(result) == {1, 2, 3, 4, 5, 6, 7}


def test_exact_union_coverage(result):
    # the shared 12-token span yields window positions spanning 5
    # consecutive starts -> ONE island of exactly 12 tokens
    assert result[1]["n_dup_spans"] == 1
    assert result[1]["n_dup_tokens"] == 12
    assert result[2]["n_dup_spans"] == 1
    assert result[2]["n_dup_tokens"] == 12


def test_two_separate_islands(result):
    # doc 3: shared2 (8 tokens, = k) with doc 5 AND the f-run (9
    # tokens) with doc 4, separated by 20 unique tokens -> 2 islands
    assert result[3]["n_dup_spans"] == 2
    assert result[3]["n_dup_tokens"] == 8 + 9


def test_exactly_k_span(result):
    # a span of exactly k tokens is one window position -> k coverage
    assert result[5]["n_dup_spans"] == 1
    assert result[5]["n_dup_tokens"] == 8


def test_clean_and_short_docs(result):
    assert result[6]["n_dup_spans"] == 0
    assert result[6]["dup_fraction"] == 0.0
    assert result[7]["n_dup_spans"] == 0
    assert result[7]["n_tokens"] == 3


def test_fraction(result):
    r = result[2]
    assert r["dup_fraction"] == round(r["n_dup_tokens"] / r["n_tokens"], 4)


def test_adjacent_islands_merge(spark):
    """Two duplicated spans whose coverage overlaps/abuts (position
    gap <= k) fuse into one island — coverage is a union, never
    double-counted."""
    # doc 10 shares its FIRST k tokens with doc 11 and tokens 5..12
    # with doc 12 -> dup positions 1 and 5, gap 4 < k -> one island
    # covering tokens 1..12
    a = _words("p", 8)                     # tokens 1..8
    mid = _words("q", 4)                   # tokens 9..12
    docs = [
        (10, a + " " + mid),
        (11, a + " " + _words("r", 6)),
        (12, _words("t", 4) + " " + " ".join((a + " " + mid).split()[4:])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in exact_substring_spans(df, k=8).collect()}
    assert out[10]["n_dup_spans"] == 1
    assert out[10]["n_dup_tokens"] == 12

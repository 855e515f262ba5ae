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


# --------------------------- persisted span store (r09, VERDICT item 2)


def test_incremental_spans_equal_full_corpus_restricted(spark, tmp_path):
    """The incremental identity contract (the dedup_incremental_store
    recipe): commit the stored half's span hashes once, then the
    batch's incremental report must equal the FULL-corpus audit
    restricted to batch docs — duplication witnessed across the
    store/batch boundary, inside the store, and inside the batch
    alike."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.operators.dedup_store import (
        commit_spans, incremental_spans)
    from hackmd_data_pipeline_spark.tables import load_table

    from .conftest import SF_CORRECT

    d = load_table(spark, SF_CORRECT, "documents").select("doc_id", "text")
    stored = d.filter(F.col("doc_id") % 4 != 0)
    batch = d.filter(F.col("doc_id") % 4 == 0)
    dest = str(tmp_path / "spanstore")
    commit_spans(stored, dest, epoch_id=0)

    inc = {r.doc_id: (r.n_tokens, r.n_dup_spans, r.n_dup_tokens,
                      r.dup_fraction)
           for r in incremental_spans(batch, dest).collect()}
    full = {r.doc_id: (r.n_tokens, r.n_dup_spans, r.n_dup_tokens,
                       r.dup_fraction)
            for r in exact_substring_spans(d).collect()
            if r.doc_id % 4 == 0}
    assert inc == full and len(inc) > 0


def test_span_store_planted_cross_epoch_leak(spark, tmp_path):
    """The deployment scenario the store exists for: an epoch-1 batch
    doc quoting an epoch-0 stored doc VERBATIM is flagged without any
    store rescan; a clean batch doc is not; a batch-internal dup pair
    is caught too; and epoch commits are replay-idempotent."""
    from hackmd_data_pipeline_spark.operators.dedup_store import (
        commit_spans, incremental_spans)

    leak = _words("L", 10)
    store_docs = spark.createDataFrame(
        [(1, _words("a", 10) + " " + leak + " " + _words("b", 10))],
        "doc_id long, text string")
    dest = str(tmp_path / "spanstore")
    commit_spans(store_docs, dest, epoch_id=0, k=K)
    # replayed commit converges (overwrite, not append)
    commit_spans(store_docs, dest, epoch_id=0, k=K)
    n0 = spark.read.parquet(dest + "/spans").count()
    commit_spans(store_docs, dest, epoch_id=0, k=K)
    assert spark.read.parquet(dest + "/spans").count() == n0

    twin = _words("T", 9)
    batch = spark.createDataFrame(
        [(10, _words("x", 6) + " " + leak + " " + _words("y", 6)),
         (11, _words("q", 30)),
         (12, twin + " " + _words("u", 8)),
         (13, twin + " " + _words("v", 8))],
        "doc_id long, text string")
    got = {r.doc_id: r.asDict()
           for r in incremental_spans(batch, dest, k=K).collect()}
    assert got[10]["n_dup_tokens"] == 10 and got[10]["n_dup_spans"] == 1
    assert got[11]["n_dup_tokens"] == 0
    assert got[12]["n_dup_tokens"] == 9 and got[13]["n_dup_tokens"] == 9

    # growing the store by the batch epoch makes a LATER quoting batch
    # see it (the cross-epoch lifecycle)
    commit_spans(batch, dest, epoch_id=1, k=K)
    later = spark.createDataFrame(
        [(20, twin + " " + _words("w", 3))], "doc_id long, text string")
    got2 = incremental_spans(later, dest, k=K).collect()[0]
    assert got2.n_dup_tokens == 9


def test_span_store_tombstone_and_compaction(spark, tmp_path):
    """remove_docs excludes a deleted doc's spans from witnessing
    immediately, and compact_store folds the spans table physically
    (deleted rows gone, one generation)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.operators.dedup_store import (
        commit_spans, compact_store, incremental_spans, remove_docs)

    leak = _words("L", 10)
    store_docs = spark.createDataFrame(
        [(1, _words("a", 10) + " " + leak),
         (2, _words("c", 30))],
        "doc_id long, text string")
    dest = str(tmp_path / "spanstore")
    commit_spans(store_docs, dest, epoch_id=0, k=K)

    batch = spark.createDataFrame(
        [(10, leak + " " + _words("y", 6))], "doc_id long, text string")
    assert incremental_spans(batch, dest, k=K).collect()[0].n_dup_tokens == 10

    remove_docs(spark.createDataFrame([(1,)], "id long"), dest)
    assert incremental_spans(batch, dest, k=K).collect()[0].n_dup_tokens == 0

    folded = str(tmp_path / "folded")
    stats = compact_store(spark, dest, folded)
    assert "spans" in stats
    rows = spark.read.parquet(folded + "/spans")
    assert rows.filter(F.col("doc_id") == 1).count() == 0
    assert rows.filter(F.col("doc_id") == 2).count() > 0
    assert incremental_spans(batch, folded, k=K).collect()[0].n_dup_tokens == 0

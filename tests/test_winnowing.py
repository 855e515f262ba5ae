"""Property tests for winnowing fingerprints (the MOSS guarantee):
any substring match of length >= w + k - 1 yields >= 1 shared
fingerprint; disjoint-alphabet docs share none; density ~ 2/(w+1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.dedup import (
    winnow_fingerprints, winnowing_pairs)

K, W = 8, 4
GUARANTEE = W + K - 1  # 11 chars


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_substring_guarantee(spark):
    shared = "the quick brown fox jumps over the lazy dog"  # >> 11 chars
    d = _docs(spark, [
        (1, f"AAAA {shared} BBBB"),
        (2, f"XXXX YYYY {shared} ZZZZ"),
    ])
    fps = winnow_fingerprints(d, k=K, w=W)
    a = {r.fp for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a & b, "docs sharing a long substring must share a fingerprint"


def test_disjoint_docs_share_nothing(spark):
    d = _docs(spark, [
        (1, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
        (2, "1111 2222 3333 4444 5555 6666 7777 8888"),
    ])
    pairs = winnowing_pairs(d, k=K, w=W, min_shared=1)
    assert pairs.count() == 0


def test_identical_docs_max_overlap(spark):
    text = "identical content repeated across both documents here"
    d = _docs(spark, [(1, text), (2, text)])
    fps = winnow_fingerprints(d, k=K, w=W)
    a = {r.fp for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a == b and a


def test_density_is_sublinear(spark):
    text = " ".join(f"word{i}" for i in range(200))  # ~1400 chars
    d = _docs(spark, [(1, text)])
    n_fp = winnow_fingerprints(d, k=K, w=W).count()
    n_grams = len(text) - K + 1
    # winnowing selects ~2/(w+1) of positions; distinct-ing can only
    # lower it. Allow generous slack, require real compression.
    assert n_fp < n_grams * 0.75
    assert n_fp > n_grams * 0.05


def test_short_docs_yield_nothing(spark):
    d = _docs(spark, [(1, "tiny"), (2, "x" * (K + W - 2))])
    assert winnow_fingerprints(d, k=K, w=W).count() == 0

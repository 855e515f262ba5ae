"""SimHash 64-bit property tests.

The blocked candidate join must be EXACT for Hamming <= max_hamming:
4 disjoint 16-bit blocks over a 64-bit signature guarantee (pigeonhole)
that any pair within distance 3 agrees on >= 1 block, so blocking loses
nothing vs the all-pairs scan; the bit_count(xor) verify then drops
false candidates. Also checks the packed vote kernel (4 lanes x 16-bit
counters per sum column) against a per-bit Python reimplementation.

North-star operator (SimHash near-dup, SURVEY.md §2 extension set);
no reference counterpart — the reference pipeline has no dedup.
"""
from __future__ import annotations

import itertools
import random

import pytest

from hackmd_data_pipeline_spark.operators.dedup import (
    simhash_pairs,
    simhash_signatures,
)


def _corpus(n_base: int = 30, doc_len: int = 100, seed: int = 11):
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(400)]
    docs = []
    for d in range(n_base):
        toks = [rng.choice(vocab) for _ in range(doc_len)]
        docs.append((f"base_{d}", " ".join(toks)))
        mut = list(toks)
        mut[7] = "mutated_token"
        docs.append((f"mut_{d}", " ".join(mut)))
    return docs


def _py_simhash(text: str, hash_fn) -> int:
    toks = text.strip().lower().split()
    votes = [0] * 64
    for t in toks:
        h = hash_fn(t)
        for i in range(64):
            votes[i] += (h >> i) & 1
    n = len(toks)
    sig = 0
    for i in range(64):
        if 2 * votes[i] > n:
            sig |= 1 << i
    return sig


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(_corpus(), ["doc_id", "text"]).cache()


def test_packed_votes_match_per_bit_reference(spark, corpus_df):
    """The 4-lane packed counters produce the same signature as a
    straightforward per-bit vote using Spark's own xxhash64."""
    from pyspark.sql import functions as F

    toks = (corpus_df.select("doc_id",
                             F.explode(F.split(F.trim(F.lower("text")), "\\s+")).alias("tok"))
            .filter(F.length("tok") > 0)
            .withColumn("h", F.xxhash64("tok")))
    tok_hashes = {}
    for r in toks.collect():
        tok_hashes.setdefault(r.doc_id, []).append(r.h & ((1 << 64) - 1))

    def py_sig(hashes):
        votes = [0] * 64
        for h in hashes:
            for i in range(64):
                votes[i] += (h >> i) & 1
        n = len(hashes)
        return sum(1 << i for i in range(64) if 2 * votes[i] > n)

    expected = {d: py_sig(hs) for d, hs in tok_hashes.items()}
    got = {r.doc_id: r.simhash & ((1 << 64) - 1)
           for r in simhash_signatures(corpus_df).collect()}
    assert got == expected


def test_blocked_pairs_exactly_match_all_pairs_hamming(spark, corpus_df):
    """Pigeonhole blocking is lossless: blocked-join output == brute
    force all-pairs Hamming <= 3 over the same signatures."""
    sigs = {r.doc_id: r.simhash & ((1 << 64) - 1)
            for r in simhash_signatures(corpus_df).collect()}
    truth = {(a, b) for a, b in itertools.combinations(sorted(sigs), 2)
             if _ham(sigs[a], sigs[b]) <= 3}
    got = {(r.id_a, r.id_b) for r in simhash_pairs(corpus_df).collect()}
    assert got == truth
    # one-token mutations of 100-token docs should mostly survive
    planted = sum(1 for d in range(30) if (f"base_{d}", f"mut_{d}") in got)
    assert planted >= 20


def test_signature_uses_full_64_bits(spark, corpus_df):
    """Signatures spread across the full 64-bit space (the round-2
    scale fix: 32-bit signatures capped block keys at 256 values)."""
    sigs = [r.simhash & ((1 << 64) - 1)
            for r in simhash_signatures(corpus_df).collect()]
    assert max(s.bit_length() for s in sigs) > 56

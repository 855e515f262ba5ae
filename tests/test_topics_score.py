"""Gates for text_topics_score — the pinned-artifact topic scorer
(r06 VERDICT item 1).

The cross-engine value check itself lives in the auto-parametrized
tests/test_queries_oracle.py gate (and the driver's CORRECTNESS row);
what THIS file pins:

  * provenance — the frozen PINNED_TOPIC_TERMS literal is exactly what
    derive_topic_term_artifact produces from the sf0.01 table (the
    PINNED_BPE_MERGES pattern: the artifact is a pure function of the
    table, not a hand-edited fixture);
  * exact-integer determinism — scores are int64 micro-log-prob sums,
    so reruns and repartitionings are bit-identical (the property that
    justifies promoting scoring to a full oracle while training stays
    pytest-gated);
  * the argmax contract on crafted docs — tie -> lowest topic id, OOV
    tokens ignored, zero-in-vocab docs dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.topics import (
    PINNED_TOPIC_TERMS,
    derive_topic_term_artifact,
    topic_scores,
)

from .conftest import SF_CORRECT


def test_pinned_artifact_provenance(spark):
    """The frozen literal must be exactly what the derivation produces
    from sf0.01 — single-partition pinned input makes the LDA train
    bit-deterministic (proven in test_topics_lda), so this re-derive
    is exact equality, not a tolerance check."""
    assert derive_topic_term_artifact(spark, SF_CORRECT) == PINNED_TOPIC_TERMS


def test_scores_exact_across_partitionings(spark):
    """int64 sums are reduction-order-independent: 1-partition and
    16-partition runs over the same docs produce identical rows."""
    d = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
         .filter(F.length(F.trim("text")) > 0).limit(200))
    one = sorted(map(tuple, topic_scores(d.coalesce(1), PINNED_TOPIC_TERMS).collect()))
    many = sorted(map(tuple, topic_scores(d.repartition(16), PINNED_TOPIC_TERMS).collect()))
    assert one == many


def test_argmax_contract_on_crafted_docs(spark):
    """Hand-checkable artifact: 2 terms x 2 topics. doc 1 favors topic
    0; doc 2 ties exactly (one occurrence of each term) -> lowest
    topic wins; doc 3 is all-OOV -> dropped; OOV tokens in doc 1
    contribute nothing."""
    art = [("alpha", (-1_000_000, -3_000_000)),
           ("beta", (-3_000_000, -1_000_000))]
    d = spark.createDataFrame(
        [(1, "alpha alpha oovword beta"),   # t0: -5M, t1: -7M -> topic 0
         (2, "alpha beta"),                 # tie -4M/-4M -> topic 0
         (3, "zzz qqq")],                   # no vocab hit -> dropped
        "doc_id long, text string")
    rows = {r.doc_id: r for r in topic_scores(d, art).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].topic_id == 0
    assert rows[1].logp_micros == -5_000_000
    assert rows[1].n_matched == 3          # OOV occurrence not counted
    assert rows[2].topic_id == 0           # exact tie -> lowest topic
    assert rows[2].logp_micros == -4_000_000

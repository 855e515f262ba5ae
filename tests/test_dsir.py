"""DSIR importance selection: artifact provenance, exact-integer
importance semantics, and the token-budget prefix property (r08).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.dsir import (
    DSIR_BUCKETS,
    PINNED_DSIR_WEIGHTS,
    derive_dsir_weights,
    dsir_importance,
    dsir_select,
)
from hackmd_data_pipeline_spark.tables import load_table

from .conftest import SF_CORRECT


def test_pinned_dsir_weights_provenance(spark):
    """The checked-in bucket weights must be exactly what
    derive_dsir_weights produces from sf0.01 (the PINNED_TOPIC_TERMS
    provenance discipline)."""
    assert derive_dsir_weights(spark, "/root/testdata/sf0.01") == \
        PINNED_DSIR_WEIGHTS


def test_dsir_importance_is_exact_bucket_sum(spark):
    """Per-doc importance must equal the hand-folded sum of pinned
    weights over the doc's bigram occurrences (computed independently
    via Spark's own xxhash64 on exploded bigrams), with unpinned
    buckets contributing nothing and n_bg counting only matches."""
    d = (load_table(spark, SF_CORRECT, "documents")
         .filter(F.length(F.trim("text")) > 0).limit(50))
    got = {r.doc_id: (r.importance_micros, r.n_bg)
           for r in dsir_importance(d, PINNED_DSIR_WEIGHTS).collect()}

    pin = dict(PINNED_DSIR_WEIGHTS)
    toks = d.select(
        "doc_id", F.split(F.lower(F.trim("text")), "[ \\t\\n\\x0B\\f\\r]+").alias("t"))
    rows = (toks.filter(F.size("t") >= 2)
            .select("doc_id", F.explode(F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> concat(t[i], ' ', t[i + 1]))")).alias("s"))
            .select("doc_id",
                    F.pmod(F.xxhash64("s"), F.lit(DSIR_BUCKETS))
                    .cast("int").alias("b"))
            .collect())
    want: dict = {}
    for r in rows:
        if r.b in pin:
            s, n = want.get(r.doc_id, (0, 0))
            want[r.doc_id] = (s + pin[r.b], n + 1)
    assert got == want


def test_dsir_select_is_topk_prefix_under_budget(spark):
    """The selected set must be exactly the importance-per-bigram-
    ranked prefix whose cumulative tokens stay under 25% of the
    scored corpus's tokens — recomputed independently from the
    importance frame."""
    d = (load_table(spark, SF_CORRECT, "documents")
         .filter(F.length(F.trim("text")) > 0))
    imp = dsir_importance(d, PINNED_DSIR_WEIGHTS)
    meta = d.select(
        "doc_id", "lang",
        F.size(F.split(F.lower(F.trim("text")), "[ \\t\\n\\x0B\\f\\r]+"))
        .alias("n_tok"))
    rows = sorted(imp.join(meta, "doc_id").collect(),
                  key=lambda r: (-(r.importance_micros / r.n_bg), r.doc_id))
    total = sum(r.n_tok for r in rows)
    cum, picked = 0, []
    for r in rows:
        if cum < 0.25 * total:
            picked.append(r)
        cum += r.n_tok
    want = {}
    for r in picked:
        n, t, s = want.get(r.lang, (0, 0, 0))
        want[r.lang] = (n + 1, t + r.n_tok, s + r.importance_micros)

    got = {r.lang: (r.n_docs_selected, r.tokens_selected, r.importance_sum)
           for r in dsir_select(d, PINNED_DSIR_WEIGHTS, keep_frac=0.25).collect()}
    assert got == want
    # selection is targeted: the en share of selected docs must exceed
    # the en share of the corpus (the artifact's target slice)
    n_sel = sum(v[0] for v in got.values())
    en_sel = got.get("en", (0, 0, 0))[0]
    base = {r.lang: r.cnt for r in
            d.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert en_sel / n_sel > base["en"] / sum(base.values())

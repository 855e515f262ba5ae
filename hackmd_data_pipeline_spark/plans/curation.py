"""Corpus-curation query registrations (round 3): canonical selection,
deterministic splits, stratified sampling, graph ranking, semantic
dedup.

These extend the LLM-training-data operator family (SURVEY.md §2
extension set; the reference pipeline stops at exact-id dedup —
reference src/extract/arxiv_collector.py:123-134). Oracle-checked
where the semantics are ANSI-SQL-expressible; the iterative /
clustering members are rows-only by nature with property tests in
tests/test_graph.py and tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import fingerprint
from ..tables import load_table
from .registry import query


@query(
    "dedup_keep_best",
    oracle="""
    SELECT md5(LOWER(TRIM(text)))                                  AS fp,
           arg_max(doc_id, n_chars * 10000000 - doc_id)            AS keeper_doc_id,
           CAST(MAX(n_chars) AS BIGINT)                            AS best_n_chars,
           COUNT(*)                                                AS n_copies
    FROM documents
    GROUP BY fp
    ORDER BY fp
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup canonical selection by QUALITY, not min-id: per
    duplicate group keep the LONGEST copy (ties -> smallest id). This
    is the policy real corpus curation uses — near-identical scrapes
    differ by truncation, and the keeper should be the most complete
    one, not whichever id sorted first (contrast
    dedup_exact_fingerprint's min-id rule).

    One shuffle on the 128-bit fingerprint; the argmax is a single
    max_by aggregate (no window, no self-join). The score
    ``n_chars * 1e7 - doc_id`` is an integer-exact composite key
    (doc_id < 1e7), so both engines pick the identical keeper."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(fingerprint("text").alias("fp"))
        .agg(
            F.expr("max_by(doc_id, n_chars * 10000000 - doc_id)")
             .alias("keeper_doc_id"),
            F.max("n_chars").alias("best_n_chars"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("fp")
    )


@query(
    "docs_split_assign",
    oracle="""
    SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
                WHEN doc_id % 10 = 8 THEN 'val'
                ELSE 'test' END                     AS split,
           COUNT(*)                                 AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)             AS total_chars,
           COUNT(DISTINCT lang)                     AS n_langs
    FROM documents
    GROUP BY split
    ORDER BY split
    """,
)
def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split assignment via key modulo — the
    ORACLE-CHECKABLE member of the split family (docs_train_val_test
    _split uses a salted hash for key-uniformity and is rows-only; the
    modulo form trades uniformity-under-clustered-keys for exact
    cross-engine reproducibility). Assignment is a pure projection
    (zero shuffle); the per-split profile is one aggregation.
    Disjointness/coverage hold by construction: every id lands in
    exactly one residue class."""
    d = load_table(spark, sf_dir, "documents")
    split = (F.when(F.pmod("doc_id", F.lit(10)) < 8, "train")
             .when(F.pmod("doc_id", F.lit(10)) == 8, "val")
             .otherwise("test"))
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.countDistinct("lang").alias("n_langs"))
        .orderBy("split")
    )


@query(
    "docs_sample_stratified",
    oracle="""
    WITH flagged AS (
        SELECT lang, n_chars,
               CASE WHEN doc_id % 10 <
                    (CASE WHEN lang = 'en' THEN 2 ELSE 5 END)
                    THEN 1 ELSE 0 END AS sampled
        FROM documents
    )
    SELECT lang,
           COUNT(*)                                        AS n_total,
           CAST(SUM(sampled) AS BIGINT)                    AS n_sampled,
           ROUND(CAST(SUM(sampled) AS DOUBLE) / COUNT(*), 4) AS frac
    FROM flagged
    GROUP BY lang
    ORDER BY lang
    """,
)
def docs_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified down-sampling with per-stratum rates (the corpus-
    rebalancing primitive: head languages sampled harder than tail
    ones). Deterministic modulo membership makes it oracle-checkable
    AND re-runnable — the same doc is always in or out, so incremental
    pipeline re-runs don't churn the sample. Pure projection + one
    aggregation; at 100 TB the sample predicate pushes into the scan
    and the un-sampled rows never leave the mapper."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 2).otherwise(5)
    sampled = F.when(F.pmod("doc_id", F.lit(10)) < rate, 1).otherwise(0)
    return (
        d.select("lang", sampled.alias("sampled"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_total"),
             F.sum("sampled").alias("n_sampled"),
             F.round(F.sum("sampled").cast("double") / F.count("*"), 4)
              .alias("frac"))
        .orderBy("lang")
    )


@query("graph_pagerank_neardup", oracle=None)
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup pair graph: boilerplate/template
    docs (near-matching many well-connected docs) surface as hubs —
    the inspect-or-downweight list a curation pass wants. Edges are
    MinHash-LSH pairs (jaccard >= 0.3, the dedup_minhash_lsh
    surface); 10 damped rounds (operators/graph.py). Iterative =>
    rows-only; ranks are verified against a numpy reference on known
    graphs in tests/test_graph.py."""
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.graph import pagerank

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, jaccard_threshold=0.3, sort=False)
    return (
        pagerank(pairs)
        .select(F.col("id").alias("doc_id"), "rank")
        .orderBy(F.desc("rank"), "doc_id")
    )


@query("dedup_semantic_semdedup", oracle=None)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic dedup over the embedding
    table: k-means cells -> within-cell cosine pairs (vectorized
    per-cell kernel, never a cross-join) -> connected components ->
    keep the group member FARTHEST from its cluster centroid.
    Clustering + iterative CC => rows-only; the keep-farthest rule and
    planted-duplicate grouping are property-tested in
    tests/test_similarity.py."""
    from ..operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(emb, n_clusters=16, threshold=0.45)

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


@query(
    "dedup_cc_clusters",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT doc_id, SUBSTR(LOWER(TRIM(text)), 1, 40) AS head
        FROM documents WHERE LENGTH(TRIM(text)) > 0
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM d a JOIN d b
          ON SUBSTR(a.head, 1, 8) = SUBSTR(b.head, 1, 8)
         AND a.doc_id < b.doc_id
        WHERE levenshtein(a.head, b.head) <= 10
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(id, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    )
    SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id,
           (MIN(r) = id) AS is_canonical
    FROM reach GROUP BY id ORDER BY doc_id
    """,
)
def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components with a FULL VALUE ORACLE: the iterative
    dedup_clusters operator (min-label propagation / bounded-graph
    union-find, operators/dedup.py) is gated hard against a DuckDB
    recursive-CTE transitive closure over the SAME oracle-expressible
    pair source (the prefix-blocked edit-distance pairs of
    dedup_editdistance). The LSH-pair CC queries stay rows-only
    because xxhash64 banding is engine-specific; this query pins the
    component-resolution semantics themselves — every id labeled with
    its component's minimum, canonical = label owner — across both
    execution paths."""
    from ..operators.dedup import dedup_clusters

    pairs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id",
                F.substring(F.lower(F.trim(F.col("text"))), 1, 40).alias("head"))
        .withColumn("_blk", F.substring("head", 1, 8))
    )
    a, b = pairs.alias("a"), pairs.alias("b")
    edge_pairs = (
        a.join(b, (F.col("a._blk") == F.col("b._blk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(F.levenshtein(F.col("a.head"), F.col("b.head")) <= 10)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    return (
        dedup_clusters(edge_pairs)
        .select(F.col("id").alias("doc_id"), "cluster_id",
                (F.col("id") == F.col("cluster_id")).alias("is_canonical"))
        .orderBy("doc_id")
    )


@query(
    "docs_oov_rate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, LOWER(t.tok) AS tok
        FROM documents,
             UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS t(tok)
        WHERE LENGTH(TRIM(text)) > 0 AND LENGTH(t.tok) > 0
    ), vocab AS (
        SELECT tok FROM (
            SELECT tok, COUNT(DISTINCT doc_id) AS df
            FROM toks GROUP BY tok
            ORDER BY df DESC, tok
            LIMIT 64
        )
    ), per_doc AS (
        SELECT t.doc_id, t.lang,
               COUNT(*) AS n_tok,
               CAST(COALESCE(SUM(CASE WHEN v.tok IS NULL THEN 1 END), 0) AS BIGINT) AS n_oov
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           COUNT(*)                                          AS n_docs,
           CAST(SUM(n_tok) AS BIGINT)                        AS total_tokens,
           CAST(SUM(n_oov) AS BIGINT)                        AS total_oov,
           ROUND(CAST(SUM(n_oov) AS DOUBLE) / SUM(n_tok), 4) AS oov_rate
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def docs_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: per-language out-of-vocabulary rate
    against a document-frequency top-64 vocabulary — the analysis a
    tokenizer-training pipeline runs to size its vocab and find
    under-covered languages. Vocab selection is deterministic
    (df DESC, token ASC tie-break) so both engines pick the identical
    set.

    Scale: one explode + two hash aggregations; the vocab (top-k,
    bounded) joins as a BROADCAST left join, so corpus tokens never
    shuffle for membership — the same bounded-dimension posture as
    docs_decontamination's benchmark side."""
    d = load_table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = (d.select("doc_id", "lang",
                     F.explode(F.split(F.trim(F.lower("text")), "\\s+")).alias("tok"))
            .filter(F.length("tok") > 0))
    vocab = (toks.groupBy("tok")
             .agg(F.countDistinct("doc_id").alias("df"))
             .orderBy(F.desc("df"), "tok").limit(64)
             .select("tok", F.lit(True).alias("_in_vocab")))
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_tok"),
             F.coalesce(F.sum(F.when(F.col("_in_vocab").isNull(), 1)), F.lit(0))
              .alias("n_oov"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").alias("total_tokens"),
             F.sum("n_oov").alias("total_oov"),
             F.round(F.sum("n_oov").cast("double") / F.sum("n_tok"), 4)
              .alias("oov_rate"))
        .orderBy("lang")
    )

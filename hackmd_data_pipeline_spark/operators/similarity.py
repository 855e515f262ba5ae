"""Similarity search over embedding columns (north-star extension).

  * cosine / dot_product — pure column expressions (zip_with +
    left-fold aggregate): deterministic order of operations so the
    DuckDB oracle (list_zip + list_transform + list_reduce) matches
    bit-for-bit before rounding.
  * brute_force_topk — exact baseline: broadcast the (small) query
    set against the corpus; one window for per-query top-k.
  * ivf_topk — the scale path: KMeans coarse quantizer; probe only
    the nprobe nearest centroids per query, so the scored pair space
    is corpus/nlist * nprobe per query instead of the full corpus.

At 100 TB the corpus side never shuffles for brute_force_topk (query
set broadcasts); for IVF the corpus is hash-partitioned by centroid id
once and reused across query batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products (deterministic fp order)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k: ``query_id | vec_id | cosine | rank``.

    ``queries`` must be small (it is broadcast); the corpus streams
    through one whole-stage-codegen'd projection, then a per-query
    window takes the top k. Ties break by vec_id. Norms are computed
    once per row on each side BEFORE the join — only the dot product
    is per-pair work.
    """
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
        .withColumn("_qnorm", l2_norm(F.col("_qvec")))
    )
    c = corpus.withColumn("_cnorm", l2_norm(F.col(vec_col)))
    scored = (
        c.join(q, F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col, id_col,
            (dot_product(F.col(vec_col), F.col("_qvec"))
             / (F.col("_cnorm") * F.col("_qnorm"))).alias("_cos"),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("_cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round(F.col("_cos"), 6).alias("cosine"), "rank")
        .orderBy(query_id_col, "rank")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             nlist: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", seed: int = 42) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning.

    Train KMeans(nlist) on the corpus, assign each vector to its nearest
    centroid, score queries only against vectors in their nprobe
    nearest cells. Recall < 1.0 by construction — rows-only check.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # keep the original embedding alongside the ML vector so the cell
    # assignment needs no join back to the corpus (transform passes
    # through all input columns)
    train = corpus.select(id_col, vec_col,
                          array_to_vector(_as_double(F.col(vec_col))).alias("features"))
    # coarse quantizer: cell boundaries need not be optimal, so skip
    # the kmeans|| init passes (random init) and cap iterations —
    # recall is governed by nprobe, asserted in tests/test_similarity.py
    model = KMeans(k=nlist, seed=seed, maxIter=5, initMode="random",
                   featuresCol="features", predictionCol="cell").fit(train)
    corpus_cells = (
        model.transform(train).select(id_col, vec_col, "cell")
        .withColumn("_cnorm", l2_norm(F.col(vec_col)))
    )

    centroids = [(int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centroids, ["cell", "centroid"])

    # nprobe nearest cells per query (query set and centroids are tiny)
    qc = (
        queries.crossJoin(F.broadcast(cent_df))
        .select(query_id_col, F.col(vec_col).alias("_qvec"), "cell",
                cosine(F.col(vec_col), F.col("centroid")).alias("_ccos"))
    )
    wq = W.partitionBy(query_id_col).orderBy(F.col("_ccos").desc(), F.col("cell"))
    probe = (
        qc.withColumn("_r", F.row_number().over(wq)).filter(F.col("_r") <= nprobe)
        .select(query_id_col, F.col("_qvec"), l2_norm(F.col("_qvec")).alias("_qnorm"), "cell")
    )

    scored = (
        corpus_cells.join(F.broadcast(probe), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col,
                (dot_product(F.col(vec_col), F.col("_qvec"))
                 / (F.col("_cnorm") * F.col("_qnorm"))).alias("_cos"))
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("_cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round(F.col("_cos"), 6).alias("cosine"), "rank")
        .orderBy(query_id_col, "rank")
    )

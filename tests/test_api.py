"""Engine facade: spark.sql over registered views must agree with
DuckDB on the same SQL (the §3.3 surface — the reference delegates all
SQL to PostgreSQL; we delegate to Catalyst)."""

from __future__ import annotations

from hackmd_data_pipeline_spark.api import Engine

from .conftest import SF_CORRECT

# ANSI-portable statements that run unchanged on Spark SQL and DuckDB.
PORTABLE_SQL = [
    "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity < 10",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
]


def test_sql_surface_matches_duckdb(spark, duck):
    eng = Engine(spark, SF_CORRECT)
    for stmt in PORTABLE_SQL:
        got = sorted(tuple(r) for r in eng.sql(stmt).collect())
        want = sorted(duck.sql(stmt).fetchall())
        assert got == want, f"divergence on: {stmt}"


def test_named_query_dispatch(spark):
    eng = Engine(spark, SF_CORRECT)
    assert "q1_pricing_summary" in eng.query_names()
    assert eng.query("q1_pricing_summary").count() > 0


def test_maintenance_surfaces(spark, tmp_path):
    """The facade's corpus-maintenance methods drive the disk-state
    operators end-to-end."""
    from hackmd_data_pipeline_spark.api import Engine
    from hackmd_data_pipeline_spark.operators.dedup_store import load_pairs

    from .conftest import SF_CORRECT
    eng = Engine(spark, SF_CORRECT)

    store = str(tmp_path / "store")
    eng.build_dedup_store(store, jaccard_threshold=0.5)
    assert load_pairs(spark, store).columns == ["id_a", "id_b", "jaccard"]

    new = eng.tables["documents"].limit(3).selectExpr(
        "doc_id + 9000000 as doc_id", "text")
    pairs = eng.dedup_new_batch(new, store, jaccard_threshold=0.9)
    assert {r.id_b for r in pairs.collect()} == {9000000, 9000001, 9000002}

    zdir = str(tmp_path / "z")
    eng.write_zordered(eng.tables["orders"], zdir,
                       ["o_custkey", "o_totalprice"], num_files=4)
    assert spark.read.parquet(zdir).count() == eng.tables["orders"].count()


def test_analytics_surfaces(spark):
    """Round-3 facade additions dispatch to the real operators."""
    eng = Engine(spark, SF_CORRECT)
    sd = eng.semdedup(n_clusters=4, threshold=0.45)
    assert {"vec_id", "cell", "centroid_cosine", "cluster_id",
            "is_kept"} <= set(sd.columns)
    assert sd.count() > 0
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    pr = {r.id: r.rank for r in eng.pagerank(pairs).collect()}
    assert set(pr) == {1, 2, 3} and abs(sum(pr.values()) - 1.0) < 1e-6


def test_retrieval_surfaces(spark, tmp_path):
    """r11 facade additions: kNN join through a persisted index and
    retrieval-based decontamination flags dispatch to the real
    operators."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.api import Engine

    from hackmd_data_pipeline_spark.operators.similarity import (
        build_ivf_index)

    eng = Engine(spark, SF_CORRECT)
    # plant one exact duplicate of the first query vector in the
    # "train" corpus so the contamination flag is load-bearing
    emb = eng.tables["embeddings"]
    first = emb.orderBy("vec_id").limit(1)
    planted = first.select((F.lit(9_000_000)).alias("vec_id"), "embedding")
    idx = str(tmp_path / "idx")
    build_ivf_index(emb.select("vec_id", "embedding").unionByName(planted),
                    idx, nlist=4)

    q = first.select(F.col("vec_id").alias("query_id"), "embedding")
    got = eng.knn_join(idx, q, k=5, nprobe=4)
    assert got.columns == ["query_id", "vec_id", "cosine", "rank"]
    assert got.count() == 5

    flags = eng.decontaminate_ann(idx, q, threshold=0.999999, k=5,
                                  nprobe=4)
    assert [(r.query_id, r.vec_id) for r in flags.collect()] == [
        (first.first().vec_id, 9_000_000)]


def test_explain_surface(spark):
    eng = Engine(spark, SF_CORRECT)
    plan = eng.explain("q1_pricing_summary")
    assert "HashAggregate" in plan and "Scan parquet" in plan


def test_gate_window_fits_all_uncovered():
    """Driver-contract arithmetic guard (VERDICT r03 item 7): the
    driver's correctness gate samples only the FIRST 50 entries of
    queries(); every query still needing a driver row (never gated,
    hash-failed, promoted to a new oracle, or force-regated) must sort
    inside that window or it can never turn green."""
    import __spark_entry__ as e

    uncovered = [n for n in e._ORDERED if e._tier(n) < 3]
    assert len(uncovered) <= 50, (
        f"{len(uncovered)} uncovered queries exceed the driver's 50-row "
        f"gate window; defer some via _DEFER_WITHIN_UNVERIFIED: "
        f"{uncovered}")
    head = set(e._ORDERED[:50])
    assert all(n in head for n in uncovered)

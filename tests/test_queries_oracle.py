"""Replicates the driver's correctness gate locally: every registered
query with an oracle runs on Spark AND DuckDB at sf0.01; results must
match on row count, column names, and (order-insensitively) values.
"""

from __future__ import annotations

import math

import pytest

from hackmd_data_pipeline_spark.plans import REGISTRY

from .conftest import SF_CORRECT


def _normalize(rows, columns):
    """Sort columns by name, canonicalize cell values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # driver-style value canonicalization: fixed decimal repr
            return f"{v:.6f}"
        return str(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.builder(spark, SF_CORRECT)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(q.oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")

    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.builder(spark, SF_CORRECT)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_approx_percentiles_close(spark):
    """The sketch path must land within ~1% of the exact percentiles
    (rank error 1/accuracy on a smooth-ish distribution)."""
    exact = {r.o_orderpriority: (r.p25, r.p50, r.p75, r.p95)
             for r in REGISTRY["agg_exact_percentiles"]
             .builder(spark, SF_CORRECT).collect()}
    approx = {r.o_orderpriority: (r.p25, r.p50, r.p75, r.p95)
              for r in REGISTRY["agg_approx_percentiles"]
              .builder(spark, SF_CORRECT).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(e - a) <= 0.02 * abs(e) + 1e-9, (k, e, a)


def test_hll_estimates_close(spark):
    """HLL(lgK=12) estimates must land within 2% of exact uniques,
    including the merged (union) global estimate."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.tables import load_table
    got = {r.o_orderpriority: r.est_uniques
           for r in REGISTRY["agg_hll_mergeable"]
           .builder(spark, SF_CORRECT).collect()}
    o = load_table(spark, SF_CORRECT, "orders")
    exact = {r.o_orderpriority: r.n for r in
             o.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    exact["ALL"] = o.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) <= 0.02 * exact[k] + 2, (
            k, got[k], exact[k])


def test_kll_quantiles_close(spark):
    """KLL guarantees RANK error (~1.7% at default k), not value
    error — on a heavy tail a 1% rank slip is a large value delta. So
    the assertion is rank-band containment: each sketch quantile must
    lie between the exact values at p±3% rank."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.tables import load_table
    got = {r.event_type: (r.p50, r.p90, r.p99)
           for r in REGISTRY["agg_kll_quantiles"]
           .builder(spark, SF_CORRECT).collect()}
    ev = load_table(spark, SF_CORRECT, "events")
    bands = [(0.47, 0.53), (0.87, 0.93), (0.96, 1.0)]
    lo_hi = {r.event_type: list(zip(r.lo, r.hi)) for r in
             ev.groupBy("event_type")
             .agg(F.percentile("value", F.array(
                 *[F.lit(b[0]) for b in bands])).alias("lo"),
                  F.percentile("value", F.array(
                      *[F.lit(b[1]) for b in bands])).alias("hi")).collect()}
    assert set(got) == set(lo_hi)
    for k, qs in got.items():
        for g, (lo, hi) in zip(qs, lo_hi[k]):
            assert lo - 1e-6 <= g <= hi + 1e-6, (k, g, lo, hi)


def test_topk_sketch_close(spark):
    """The combined top-k sketch must contain the true heavy hitters
    with exact-or-near counts (the synthetic corpus has clear margins)."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.tables import load_table
    got = {r.term: r.est_count
           for r in REGISTRY["agg_approx_topk_terms"]
           .builder(spark, SF_CORRECT).collect()}
    assert len(got) == 20
    d = load_table(spark, SF_CORRECT, "documents").filter(
        F.length(F.trim("text")) > 0)
    exact = (d.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
                      .alias("term"))
             .filter(F.length("term") > 0)
             .groupBy("term").count()
             .orderBy(F.desc("count"), "term").limit(10).collect())
    for r in exact:  # true top-10 must all be tracked, counts within 5%
        assert r.term in got, f"missing heavy hitter {r.term}"
        assert abs(got[r.term] - r['count']) <= 0.05 * r['count'], (
            r.term, got[r.term], r['count'])


def test_theta_estimates_close(spark):
    """Theta sketch distinct estimates within 5% of exact."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.tables import load_table
    got = {r.source: r.est_distinct_docs
           for r in REGISTRY["agg_theta_sketch_distinct"]
           .builder(spark, SF_CORRECT).collect()}
    d = load_table(spark, SF_CORRECT, "documents")
    exact = {r.source: r.n for r in
             d.groupBy("source")
             .agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) <= 0.05 * exact[k] + 2, (
            k, got[k], exact[k])


# --------------------------------------------- small-n estimator sweep

# Queries whose results carry n-dependent statistical estimators:
# sample-vs-population gaps shrink as O(1/n), so a divergence can hide
# under the rounding at sf0.01 group sizes and only peek out at
# sf0.001 (this caught agg_stats_suite's skewness mismatch in round
# 3). Sweep exactly these at the smallest scale too.
SMALL_N_SENSITIVE = [
    "agg_stats_suite", "agg_exact_percentiles", "customer_rfm_segments",
    "events_anomaly_zscore", "o30_group_run_stats", "dq_profile_orders",
]

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_smoke_oracle():
    import duckdb

    from .conftest import TABLES
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", SMALL_N_SENSITIVE)
def test_oracle_match_small_n(spark, duck_smoke_oracle, name):
    q = REGISTRY[name]
    sdf = q.builder(spark, SF_SMOKE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = duck_smoke_oracle.sql(q.oracle)
    duck_rows = rel.fetchall()
    assert len(spark_rows) == len(duck_rows), name
    ns = _normalize(spark_rows, list(sdf.columns))
    nd = _normalize(duck_rows, list(rel.columns))
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: {mismatches[:3]}"


def test_curation_decisions_histogram_equals_funnel(spark):
    """docs_curation_decisions' verdict histogram must reproduce
    docs_curation_funnel's stage counts exactly (same thresholds by
    construction): nonempty = all - empty, quality_keep = keep +
    exact_dup survivors' group members, exact_dedup = keep count."""
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.plans import REGISTRY

    sf = SF_CORRECT
    dec = {r["verdict"]: r["n"] for r in
           REGISTRY["docs_curation_decisions"].builder(spark, sf)
           .groupBy("verdict").agg(F.count("*").alias("n")).collect()}
    fun = {r["stage"]: r["n_docs"] for r in
           REGISTRY["docs_curation_funnel"].builder(spark, sf).collect()}
    total = sum(dec.values())
    assert fun["raw"] == total
    assert fun["nonempty"] == total - dec.get("empty", 0)
    assert fun["quality_keep"] == dec.get("keep", 0) + dec.get("exact_dup", 0)
    assert fun["exact_dedup"] == dec.get("keep", 0)

"""Relational core queries (SURVEY.md §2.C/D/F/G/H — Phase 1).

Each query is the Spark-first re-expression of a reference operator
(O-nn ids cite SURVEY.md §2, which cites /root/reference file:line).
Built with the DataFrame API so Catalyst gets full pushdown/pruning
freedom; oracles are plain ANSI SQL for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import elapsed_micros
from ..tables import load_table
from .registry import query

# --------------------------------------------------------------- aggregation


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary — the O-30/O-31 grouped
    stats family (reference arxiv_collector.py:102-121) generalized to a
    full multi-aggregate scan. Single shuffle on the two group keys;
    partial aggregation map-side; filter pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "o29_count_filtered",
    oracle="""
    SELECT COUNT(*) AS pending_count
    FROM events
    WHERE event_type = 'view'
    """,
)
def o29_count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-29: COUNT(*) under a status predicate (reference
    arxiv_etl.py:171-179 pending-batch count). Filter pushed down;
    count is a map-side partial + single-row final."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "view").agg(F.count("*").alias("pending_count"))


@query(
    "o30_group_run_stats",
    oracle="""
    SELECT event_type                                              AS category_name,
           CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT)   AS elapsed_us,
           COUNT(*)                                                AS s3_count,
           ROUND(SUM(value), 2)                                    AS value_sum
    FROM events
    GROUP BY event_type
    ORDER BY category_name
    """,
)
def o30_group_run_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-30: per-group run stats — elapsed time, volume counts
    (reference category_run_stats, create_table.sql:44-50). Elapsed is
    exact integer microseconds so the oracle comparison is drift-free."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("category_name"))
        .agg(
            elapsed_micros(F.max("ts"), F.min("ts")).alias("elapsed_us"),
            F.count("*").alias("s3_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .orderBy("category_name")
    )


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey)                    AS distinct_parts,
           COUNT(DISTINCT l_suppkey)                    AS distinct_supps,
           COUNT(DISTINCT (l_returnflag, l_linestatus)) AS distinct_flag_status
    FROM lineitem
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension agg (SURVEY.md §2.F): exact distinct counts. Spark
    plans these as partial-distinct expand + final; see also
    agg_approx_distinct (rows-only) for the 100 TB-friendly sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("distinct_flag_status"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey)  AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_within_tol,
           TRUE AS orders_within_tol
    FROM lineitem
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the scale path for 100 TB
    id-cardinality questions.

    PROMOTED rows-only -> driver oracle in r05 (VERDICT r04 item 2) via
    the exact+tolerance pattern: the sketch estimate itself is
    engine-specific, so the emitted row carries the EXACT cardinalities
    (SQL-restatable) plus booleans asserting the deterministic HLL++
    estimate (rsd=0.02) landed within 10%+2 of exact — DuckDB restates
    the exact columns and literal TRUE, making the sketch-accuracy gate
    driver-visible instead of pytest-only."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("ao"),
    )

    def ok(est, exact):
        return (F.abs(F.col(est) - F.col(exact))
                <= 0.1 * F.col(exact) + F.lit(2))

    return agg.select(
        "exact_parts", "exact_orders",
        ok("ap", "exact_parts").alias("parts_within_tol"),
        ok("ao", "exact_orders").alias("orders_within_tol"),
    )


@query(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r_name, n_name, COUNT(c_custkey) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension agg: hierarchical ROLLUP totals (region -> nation ->
    grand total). Dimension tables are broadcast — no shuffle for the
    joins, one shuffle for the rollup aggregation."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("c_custkey").alias("n_customers"),
             F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


# ------------------------------------------------------------------- filters


@query(
    "o17_status_filter_neq",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def o17_status_filter_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-17: != status predicate (reference arxiv_collector.py:87-91
    ``status != 'Finished'``). Pushed to the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderstatus").agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderstatus")
    )


@query(
    "o19_time_range_filter",
    oracle="""
    SELECT CAST(l_shipdate AS DATE) AS ship_date, COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= (SELECT MAX(l_shipdate) FROM lineitem) - INTERVAL 6 MONTH
    GROUP BY ship_date
    ORDER BY ship_date
    """,
)
def o19_time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-19: lookback-window predicate ``ts >= now() - INTERVAL 6 MONTHS``
    (reference arxiv_collector.py:123-134). 'now' is anchored to
    max(l_shipdate) for determinism. The 1-row cutoff is broadcast —
    the big side streams through a pushed filter."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = li.agg((F.max("l_shipdate") - F.expr("INTERVAL 6 MONTHS")).alias("cutoff"))
    return (
        li.join(F.broadcast(cutoff))
        .filter(F.col("l_shipdate") >= F.col("cutoff"))
        .groupBy(F.to_date("l_shipdate").alias("ship_date"))
        .agg(F.count("*").alias("n_items"))
        .orderBy("ship_date")
    )


@query(
    "o20_exists_semijoin",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def o20_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-20: EXISTS point-lookup generalized to a left-semi join
    (reference notebook cell bc52a9c3 ``paper_exists``). Semi join
    carries no payload columns from the probe side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment").agg(F.count("*").alias("n_customers_with_orders"))
        .orderBy("c_mktsegment")
    )


@query(
    "o21_completeness_filter",
    oracle="""
    SELECT source, COUNT(*) AS n_complete
    FROM documents
    WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
      AND lang IS NOT NULL AND LENGTH(TRIM(lang)) > 0
      AND n_chars > 0
    GROUP BY source
    ORDER BY source
    """,
)
def o21_completeness_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-21: required-fields completeness filter (reference notebook
    cell c1c6da3a): drop rows where any required field is null/blank."""
    d = load_table(spark, sf_dir, "documents")
    complete = (
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
        & F.col("lang").isNotNull() & (F.length(F.trim("lang")) > 0)
        & (F.col("n_chars") > 0)
    )
    return (
        d.filter(complete)
        .groupBy("source").agg(F.count("*").alias("n_complete"))
        .orderBy("source")
    )


# -------------------------------------------------------------------- dedup


@query(
    "o22_anti_join_dedup",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers_without_orders
    FROM customer
    ANTI JOIN orders ON o_custkey = c_custkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def o22_anti_join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-22: historical anti-join dedup — incoming minus already-seen
    ids (reference arxiv_collector.py:123-134,260-264). At scale the
    seen-id side stays bounded (the reference's 6-month lookback trick)
    so it broadcasts; here customers-without-orders stands in."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey").agg(F.count("*").alias("n_customers_without_orders"))
        .orderBy("c_nationkey")
    )


@query(
    "o23_within_batch_dedup",
    oracle="""
    SELECT COUNT(*) AS n_distinct_pairs
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    """,
)
def o23_within_batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-23: within-batch dedup, first-occurrence-wins on a key
    (reference arxiv_collector.py:251,260-264) — dropDuplicates on the
    key columns; hash-partitioned by the key, map-side partial dedup."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type").dropDuplicates()
        .agg(F.count("*").alias("n_distinct_pairs"))
    )


@query(
    "o23b_keep_last_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def o23b_keep_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-23b: keep-one-per-key, last-occurrence-wins (reference notebook
    dict-comprehension dedup) — deterministic via row_number with a
    total order (date desc, key desc). One shuffle on the key."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
        )
        .orderBy("o_custkey")
    )


@query(
    "o23c_set_difference",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def o23c_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-23c: set difference (reference arxiv_collector.py:217-222 —
    YAML categories minus DB categories) as EXCEPT."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@query(
    "o23d_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def o23d_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection — the remaining ANSI set operator alongside
    O-23c's EXCEPT (the reference computes 'categories both configured
    AND present' with Python set &, arxiv_collector.py:217-222).
    Spark plans INTERSECT as a left-semi join after aggregation —
    keyed shuffle, no all-pairs."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


# ------------------------------------------------------------ sort / top-k


@query(
    "o32_order_limit",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'P'
    ORDER BY o_orderkey
    LIMIT 10
    """,
)
def o32_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-32 (and the batch form of the O-24 claim): FIFO take-n —
    ``WHERE status='pending' ORDER BY key LIMIT n`` (reference
    arxiv_etl.py:42-57). Spark plans this as TakeOrderedAndProject —
    no global sort materialization."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "P")
        .select("o_orderkey", "o_orderstatus", "o_orderdate")
        .orderBy("o_orderkey")
        .limit(10)
    )


@query(
    "o33_topk_recent_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_orderdate
    FROM (
        SELECT o_orderpriority, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    WHERE rn <= 5
    ORDER BY o_orderpriority, o_orderdate DESC, o_orderkey DESC
    """,
)
def o33_topk_recent_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-33: most-recent-k per group (reference arXiv scan: SubmittedDate
    desc capped at max_results per category, arxiv_collector.py:245-248).
    Window top-k — AQE handles group skew; rank pushdown via
    WindowGroupLimit keeps only k rows per key before the final sort."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_orderdate")
        .orderBy("o_orderpriority", F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    )


@query(
    "o34_head_slice",
    oracle="""
    SELECT c_mktsegment
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    ORDER BY c_mktsegment
    LIMIT 3
    """,
)
def o34_head_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-34: take-first-k of an ordered small set (reference
    select_next_categories, arxiv_collector.py:63-72)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct().orderBy("c_mktsegment").limit(3)


# -------------------------------------------------------------------- joins


@query(
    "join_q3_shipping_topk",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def join_q3_shipping_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join + top-k (SURVEY.md §2.H engine
    surface). customer is small relative to lineitem -> broadcast it
    into orders; the orders->lineitem join shuffles on the order key.
    Ties on rounded revenue break by l_orderkey for determinism."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "join_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def join_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way star join: all dimension sides broadcast,
    single shuffle for the orders->lineitem equi-join + one for the
    final agg. Catalyst reorders the join tree; broadcast hints keep
    the small sides off the shuffle path."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "join_q14_promo_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) * 100
                + EXTRACT(month FROM l_shipdate) AS INT) AS ship_month,
           ROUND(SUM(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount) END), 2) AS promo_revenue,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
           ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def join_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo-revenue share per ship month. part is a
    dimension -> broadcast; ONE shuffle (the month agg). Month key is
    year*100+month integer arithmetic on the NTZ column — no
    date_trunc, which would coerce through the session timezone."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy((F.year("l_shipdate") * 100 + F.month("l_shipdate"))
                 .cast("int").alias("ship_month"))
        .agg(
            F.round(F.sum(promo_rev), 2).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.round(100.0 * F.sum(F.coalesce(promo_rev, F.lit(0.0))) / F.sum(rev), 4)
            .alias("promo_share_pct"),
        )
        .orderBy("ship_month")
    )


@query(
    "join_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS returned_revenue,
           COUNT(*) AS n_return_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY returned_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def join_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top-20 customers by
    returned revenue. The returnflag filter lands in the lineitem scan
    (pushed predicate); customer and nation broadcast; the fact-side
    shuffle is the orders equi-join + final agg. Top-k is
    TakeOrderedAndProject — no global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("returned_revenue"),
            F.count("*").alias("n_return_lines"),
        )
        .select("c_custkey", "c_name", "n_name", "returned_revenue", "n_return_lines")
        .orderBy(F.col("returned_revenue").desc(), "c_custkey")
        .limit(20)
    )


# -------------------------------------------------- events / window analytics


@query(
    "events_tumbling_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS value_sum
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream (SURVEY.md §2.I
    extension; streaming twin lives in streaming/pipeline.py with a
    watermark). Batch form: hour bucketing — one shuffle. Truncation is
    integer NTZ arithmetic (date_trunc would coerce NTZ through the
    caller's session timezone)."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    hour_start = F.timestamp_add("HOUR", F.timestamp_diff("HOUR", epoch, F.col("ts")), epoch)
    return (
        ev.groupBy(hour_start.alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sessionization",
    oracle="""
    WITH events_us AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events_us
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           ROUND(SUM(value), 2) AS value_sum
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands, 30-min inactivity gap) — the
    batch twin of session_window() in streaming. Two window passes over
    the same (user_id, ts) partitioning — one shuffle, reused."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microsecond gap, timezone-independent on NTZ
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "events_resample_ffill",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               COUNT(*)             AS n,
               ROUND(SUM(value), 2) AS vs
        FROM events GROUP BY event_type, h
    ), bounds AS (
        SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS h0,
               CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS h1
        FROM events
    ), spine AS (
        SELECT t.event_type, CAST(u.h AS TIMESTAMP) AS h
        FROM (SELECT DISTINCT event_type FROM events) t,
             bounds, UNNEST(generate_series(bounds.h0, bounds.h1,
                                            INTERVAL 1 HOUR)) AS u(h)
    )
    SELECT s.event_type                                   AS event_type,
           s.h                                            AS hour_start,
           COALESCE(n, 0)                                 AS n_events,
           last_value(vs IGNORE NULLS)
               OVER (PARTITION BY s.event_type ORDER BY s.h
                     ROWS UNBOUNDED PRECEDING)            AS value_sum_ffill,
           (hourly.event_type IS NULL)                    AS is_gap
    FROM spine s LEFT JOIN hourly
      ON hourly.event_type = s.event_type AND hourly.h = s.h
    ORDER BY s.event_type, hour_start
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample the event stream onto a
    dense hourly spine per event type, forward-filling the last seen
    hourly value across gaps and flagging synthesized rows — the
    gap-fill step every downstream ML/monitoring consumer needs before
    treating event aggregates as a regular series (an empty hour is a
    0-count fact, not a missing row).

    Plan shape: one shuffle for the hourly pre-agg (bounded by
    hours x types, tiny at any corpus scale); the spine is a
    1-row-bounds broadcast + ``sequence`` explode; the left join
    broadcasts the pre-agg; the forward fill is one window pass over
    the already-tiny spine. The raw event volume only ever flows
    through the first partial-aggregated groupBy, so the query scales
    with scan bandwidth. NTZ epoch arithmetic throughout (no
    date_trunc on the Spark side — session-timezone-independent)."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    hidx = F.timestamp_diff("HOUR", epoch, F.col("ts"))
    hourly = (ev.groupBy(F.col("event_type"), hidx.alias("h"))
              .agg(F.count("*").alias("n"),
                   F.round(F.sum("value"), 2).alias("vs")))
    bounds = ev.agg(F.min(hidx).alias("h0"), F.max(hidx).alias("h1"))
    spine = (ev.select("event_type").distinct()
             .crossJoin(F.broadcast(bounds))
             .select("event_type",
                     F.explode(F.sequence("h0", "h1")).alias("h")))
    w = (W.partitionBy("event_type").orderBy("h")
         .rowsBetween(W.unboundedPreceding, 0))
    return (
        spine.join(F.broadcast(hourly), ["event_type", "h"], "left")
        .select("event_type",
                F.timestamp_add("HOUR", F.col("h"), epoch).alias("hour_start"),
                F.coalesce("n", F.lit(0)).alias("n_events"),
                F.last("vs", ignorenulls=True).over(w).alias("value_sum_ffill"),
                F.col("n").isNull().alias("is_gap"))
        .orderBy("event_type", "hour_start")
    )


@query(
    "events_session_windows",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP)                       AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP)  AS session_end,
           COUNT(*)                                         AS n_events,
           ROUND(SUM(value), 2)                             AS value_sum
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` aggregation (streaming/sessions.py) —
    the streaming-capable form of events_sessionization: the SAME plan
    runs on a watermarked readStream (streaming ≡ batch pinned in
    tests/test_streaming_sessions.py). Merge is INCLUSIVE at the gap
    boundary (probed: an event exactly ``gap`` after the previous one
    merges), so the oracle breaks on ``diff > gap`` and the session
    end is ``last_event + gap``. One shuffle on the session key."""
    from ..streaming.sessions import session_window_agg
    ev = load_table(spark, sf_dir, "events")
    return (session_window_agg(ev, gap="30 minutes")
            .orderBy("user_id", "session_start"))


@query(
    "events_props_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(json_extract_string(props, '$.k')) AS k_present
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-16 JSON parse family (reference json.loads per line,
    arxiv_etl.py:144): semi-structured extraction with
    get_json_object, aggregated. Stays JVM-side — no Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).cast("long").alias("k_sum"), F.count(k).alias("k_present"))
        .orderBy("event_type")
    )


@query(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(json_extract_string(props, '$.k')) AS k_present,
           BOOL_AND(json_extract_string(props, '$.nope') IS NULL) AS missing_all_null,
           TRUE AS uniform_schema
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType twin of events_props_json_extract — the Spark 4
    semi-structured path a 100 TB JSON column actually wants:
    ``parse_json`` once into the binary Variant encoding, then typed
    ``variant_get`` accesses (no per-access string re-parse, and the
    open door to storage-level shredding). Emits the same aggregates
    as the string-path query plus two Variant-specific contracts:
    ``try_variant_get`` on a missing path is NULL for every row, and
    ``schema_of_variant`` infers ONE uniform schema across the corpus
    (folded to a boolean — the inferred schema string itself is
    engine-specific, the exact+boolean pattern the sketch queries
    use). DuckDB restates the aggregates via json_extract and the
    contracts as literals."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("_k"),
                  F.try_variant_get(v, "$.nope", "string").alias("_miss"),
                  F.schema_of_variant(v).alias("_sch"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("_k").cast("long").alias("k_sum"),
             F.count("_k").alias("k_present"),
             (F.count("_miss") == 0).alias("missing_all_null"),
             (F.countDistinct("_sch") == 1).alias("uniform_schema"))
        .orderBy("event_type")
    )


@query(
    "join_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*)                                    AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def join_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped scan-heavy aggregate: zero joins, zero group
    keys — the whole query is predicate pushdown + a single global
    partial/final agg. At 100 TB this is the pure scan-throughput
    probe: all four predicates reach the parquet reader (min/max
    row-group skipping on l_shipdate), and the projection is 3 columns
    regardless of table width."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "join_q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           ROUND(o_totalprice, 2)   AS total_price,
           ROUND(big.sum_qty, 2)    AS sum_qty
    FROM orders
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300) big
      ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_price DESC, o_orderkey
    LIMIT 100
    """,
)
def join_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume-customer query: aggregate the
    fact on its key (one shuffle), HAVING-filter to <1% of orders,
    then BROADCAST the survivor set into orders and customer — the
    selective-agg-then-broadcast plan that keeps both big tables
    unshuffled. Top-k via TakeOrderedAndProject, never a global
    sort. (HAVING > 300 keeps the survivor set broadcastable at any
    SF: selectivity is threshold-, not size-, determined.)"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("_sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


@query(
    "join_q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(YEAR FROM l_shipdate)::BIGINT AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 23:59:59'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def join_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped bilateral trade volume: revenue between two
    nations by year and direction. Five-way join where every
    dimension (supplier, customer, nation x2) broadcasts — lineitem
    and orders are the only shuffled sides, and the nation-pair filter
    prunes both probe streams before the fact-fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"),
                  F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    sup = (s.join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
           .select("s_suppkey", "supp_nation"))
    cus = (c.join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
           .select("c_custkey", "cust_nation"))
    shipping = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") <= F.lit("1996-12-31 23:59:59").cast("timestamp_ntz")))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cus), o.o_custkey == cus.c_custkey)
        .filter(pair)
        .select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return (
        shipping.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "join_q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o_orderdate)::BIGINT AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n1.n_name AS nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def join_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: one nation's fraction of PROMO
    part revenue per year — conditional aggregation over a star join
    (part/supplier/nation broadcast; the selective p_type filter
    reaches the part scan and shrinks the fact stream first)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup_nation = (s.join(F.broadcast(
        n.select(F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("_nk")).select("s_suppkey", "nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    all_nations = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sup_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                vol.alias("volume"), "nation")
    )
    share = (F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume"))
                   .otherwise(F.lit(0.0)))
             / F.sum("volume"))
    return (
        all_nations.groupBy("o_year")
        .agg(F.round(share, 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "join_q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS profit
    FROM (
        SELECT n.n_name AS nation,
               EXTRACT(YEAR FROM o.o_orderdate)::BIGINT AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity AS amount
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def join_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped product-line profit per (nation, year). The
    synthetic schema has no partsupp, so unit cost is modeled as
    0.6 * p_retailprice — the JOIN SHAPE (fact stream against three
    broadcast dims + the orders join) is the point of parity, not the
    cost constant. The selective p_name LIKE filter is evaluated on
    the part side BEFORE broadcast, so the fact stream shrinks at the
    first join; only the orders join shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sup_nation = (s.join(F.broadcast(
        n.select(F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("_nk")).select("s_suppkey", "nation"))
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sup_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("nation", F.year("o_orderdate").cast("long").alias("o_year"),
                amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "join_q12_shipping_delay_classes",
    oracle="""
    SELECT delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
    FROM (
        SELECT o.o_orderpriority,
               CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) >= 60 THEN 'SLOW'
                    WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) >= 30 THEN 'MEDIUM'
                    ELSE 'FAST' END AS delay_class
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    GROUP BY delay_class
    ORDER BY delay_class
    """,
)
def join_q12_shipping_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped priority-by-delay matrix (no shipmode column
    in the synthetic schema, so the class is derived from the
    order-to-ship delay): one fact-fact equi-join, then conditional
    counts per class — the map-side CASE evaluation means the only
    full shuffle after the join carries 3 groups. Both ts columns are
    NTZ; the day diff is pure date arithmetic, timezone-free."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    cls = (F.when(delay >= 60, F.lit("SLOW"))
           .when(delay >= 30, F.lit("MEDIUM"))
           .otherwise(F.lit("FAST")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(cls.alias("delay_class"), "o_orderpriority")
        .groupBy("delay_class")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"))
        .orderBy("delay_class")
    )


@query(
    "join_q19_disjunctive_pred",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def join_q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate revenue: an OR of three
    brand/size/quantity conjunctions spanning BOTH join sides. The
    part-only disjunction (brand+size) is factored out and pushed to
    the part scan before broadcast — Catalyst derives it via
    constraint propagation, but stating it explicitly pins the
    pruned-build-side plan; the mixed predicate then filters join
    output. Single broadcast join, no shuffle until the 1-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_side = ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)) | \
                ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)) | \
                ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    q = F.col("l_quantity")
    full = ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
            & q.between(1, 11)) | \
           ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
            & q.between(10, 20)) | \
           ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
            & q.between(20, 30))
    return (
        li.join(F.broadcast(p.filter(part_side)
                            .select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == F.col("p_partkey"))
        .filter(full)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count("*").alias("n_lines"))
    )

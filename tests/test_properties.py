"""Property-based tests (hypothesis) for the custom operators whose
semantics have a simple executable specification: the Spark operator
must agree with a naive in-Python reference on arbitrary generated
inputs. Spark-side evaluation is batched per example set (hypothesis
drives the data; one Spark job per example) with small deadline-free
settings since JVM round-trips dominate.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.dedup import dedup_clusters
from hackmd_data_pipeline_spark.operators.joins import asof_join
from hackmd_data_pipeline_spark.operators.similarity import normalize_quantize
from hackmd_data_pipeline_spark.operators.skew import salted_agg

SETTINGS = settings(max_examples=12, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])


# ------------------------------------------------------------ as-of join

_ts = st.integers(min_value=0, max_value=50)
_key = st.integers(min_value=0, max_value=3)


@SETTINGS
@given(
    lefts=st.lists(st.tuples(_key, _ts), min_size=1, max_size=15),
    rights=st.lists(st.tuples(_key, _ts, st.integers(-100, 100)),
                    min_size=0, max_size=15),
)
def test_asof_backward_matches_naive(spark, lefts, rights):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, ts long, lid long")
    right = spark.createDataFrame(rights, "k long, ts long, px long") \
        if rights else spark.createDataFrame([], "k long, ts long, px long")
    got = {r.lid: r.px_asof
           for r in asof_join(left, right, on="k", ts_col="ts",
                              payload_cols=("px",)).collect()}

    def naive(k, t):
        cands = [(rt, i, px) for i, (rk, rt, px) in enumerate(rights)
                 if rk == k and rt <= t]
        # latest ts wins; ties broken by input order (latest wins)
        return max(cands)[2] if cands else None

    want = {i: naive(k, t) for i, (k, t) in enumerate(lefts)}
    assert got == want


# ------------------------------------------------------ salted aggregation


@SETTINGS
@given(rows=st.lists(
    st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
    min_size=1, max_size=40))
def test_salted_agg_equals_plain_agg(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    plain = {(r.k,): (r.s, r.n) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count("*").alias("n")).collect()}
    salted = salted_agg(
        df, ["k"],
        partial_aggs=[F.sum("v").alias("s"), F.count("*").alias("n")],
        final_aggs=[F.sum("s").alias("s"), F.sum("n").alias("n")],
        buckets=4)
    got = {(r.k,): (r.s, r.n) for r in salted.collect()}
    assert got == plain


# ------------------------------------------------- int8 quantize roundtrip


@SETTINGS
@given(vecs=st.lists(
    st.lists(st.floats(min_value=-1e3, max_value=1e3,
                       allow_nan=False, allow_infinity=False,
                       width=32),
             min_size=2, max_size=8),
    min_size=1, max_size=10))
def test_quantize_roundtrip_bound(spark, vecs):
    # keep only vectors with a nonzero component (zero vectors have no
    # defined direction)
    vecs = [v for v in vecs if any(abs(x) > 1e-3 for x in v)]
    if not vecs:
        return
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>")
    for r in normalize_quantize(df).collect():
        orig = [float(x) for x in vecs[r.vec_id]]
        # float32 storage rounds the input: recompute from float32
        import numpy as np
        orig = np.asarray(orig, dtype=np.float32).astype(np.float64)
        n = math.sqrt(float((orig * orig).sum()))
        unit = orig / n
        assert abs(r.norm - n) < 1e-4 * max(n, 1.0)
        deq = [q * r.scale for q in r.qvec]
        # each element within one quantization step of the unit vector
        assert all(abs(a - b) <= r.scale + 1e-12
                   for a, b in zip(deq, unit))


# ------------------------------------------------- connected components


@pytest.mark.parametrize("threshold", [100_000, 0],
                         ids=["local-path", "distributed-path"])
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1, max_size=20))
def test_dedup_clusters_match_union_find(spark, threshold, edges):
    """Both execution paths (bounded driver-side union-find and the
    distributed min-label propagation) must equal the reference."""
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id
           for r in dedup_clusters(
               pairs, small_graph_threshold=threshold).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want


# ------------------------------------------------- bounded range join


@SETTINGS
@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 600)),
                   min_size=1, max_size=12),
    rights=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 600)),
                    min_size=0, max_size=12),
)
def test_interval_join_matches_nonequi(spark, lefts, rights):
    import datetime as dt

    from hackmd_data_pipeline_spark.operators.rangejoin import interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(k, ts(s), i) for i, (k, s) in enumerate(lefts)],
        "k long, lts timestamp_ntz, lid long")
    right = spark.createDataFrame(
        [(k, ts(s), i) for i, (k, s) in enumerate(rights)],
        "k long, rts timestamp_ntz, rid long") if rights else \
        spark.createDataFrame([], "k long, rts timestamp_ntz, rid long")

    got = {(r.lid, r.rid) for r in interval_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        delta_seconds=60).collect()}
    want = {(li, ri)
            for li, (lk, lsec) in enumerate(lefts)
            for ri, (rk, rsec) in enumerate(rights)
            if lk == rk and lsec - 60 <= rsec <= lsec}
    assert got == want


@given(st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=8))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunking_covers_every_token(spark, n_tokens_per_doc):
    """docs_chunk_sliding invariants on synthetic docs: every token
    position lands in at least one chunk, full chunks are exactly
    `window` long, consecutive full chunks overlap window-stride, and
    chunk count is ceil(n/stride)."""
    import math

    window, stride = 32, 24
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
            for i, n in enumerate(n_tokens_per_doc)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("_chunk_docs")

    from pyspark.sql import functions as F
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    starts = F.sequence(F.lit(1), F.size("toks"), F.lit(stride))
    out = (df.select("doc_id", toks.alias("toks"))
           .select("doc_id", "toks", F.explode(starts).alias("s"))
           .select("doc_id",
                   ((F.col("s") - 1) / stride).cast("long").alias("chunk_id"),
                   F.slice(F.col("toks"), F.col("s"), F.lit(window)).alias("chunk"))
           ).collect()

    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, n in enumerate(n_tokens_per_doc):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert len(chunks) == math.ceil(n / stride)
        covered = set()
        for r in chunks:
            covered.update(r.chunk)
            if r.chunk_id < len(chunks) - 1 and n - r.chunk_id * stride >= window:
                assert len(r.chunk) == window
        assert len(covered) == n  # tokens are unique by construction
        # consecutive full chunks share exactly window-stride tokens
        for a, b in zip(chunks, chunks[1:]):
            if len(a.chunk) == window:
                assert len(set(a.chunk) & set(b.chunk)) == window - stride


# --------------------------------------------- distributed prefix sum

@SETTINGS
@given(rows=st.lists(
    st.tuples(st.integers(0, 10**6),            # order key (may collide)
              st.integers(-1000, 1000)),        # value
    min_size=1, max_size=60))
def test_running_total_matches_cumsum(spark, rows):
    """attach_running_total over an arbitrary (key, value) multiset ≡
    the sequential cumulative sum along (key, row_id) — including
    duplicate order keys (broken by the id tiebreak), negative values,
    and single-row inputs. Pins the distributed two-pass rewrite to
    the naive specification the oracle-side SUM() OVER expresses."""
    from hackmd_data_pipeline_spark.operators.prefix import attach_running_total

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["rid", "k", "v"]).repartition(5)
    got = {r.rid: (r.cum, r.tot) for r in attach_running_total(
        df, "v", [F.col("k"), F.col("rid")],
        cum_col="cum", total_col="tot").collect()}

    acc, total = 0, sum(v for _, v in rows)
    for rid, k, v in sorted(data, key=lambda t: (t[1], t[0])):
        acc += v
        assert got[rid] == (acc, total), (rid, got[rid], acc, total)


# ------------------------------------------------- membership sketches


def _naive_km(h_signed: int, slots: int, probes: int) -> list[int]:
    """Executable spec of the Kirsch-Mitzenmacher derivation, in pure
    Python integer arithmetic over the 64-bit two's-complement
    pattern."""
    u = h_signed & 0xFFFFFFFFFFFFFFFF
    h1 = u >> 32
    h2 = (u & 0xFFFFFFFF) | 1
    return [(h1 + i * h2) % slots for i in range(probes)]


@SETTINGS
@given(keys=st.lists(st.integers(-(2**63), 2**63 - 1),
                     min_size=1, max_size=20, unique=True))
def test_km_positions_match_pure_python_spec(spark, keys):
    from hackmd_data_pipeline_spark.operators.membership import km_positions

    m, k = 1 << 14, 5
    rows = (spark.createDataFrame([(x,) for x in keys], "k long")
            .select("k", F.xxhash64("k").alias("h"),
                    km_positions(F.xxhash64("k"), m, k).alias("pos"))
            .collect())
    for r in rows:
        assert list(r.pos) == _naive_km(r.h, m, k), r.k


@SETTINGS
@given(hist=st.lists(st.integers(-(2**62), 2**62), min_size=1,
                     max_size=30, unique=True),
       probes=st.lists(st.integers(-(2**62), 2**62), min_size=1,
                       max_size=30, unique=True))
def test_bloom_membership_matches_naive_spec(spark, hist, probes):
    """might_contain == 'all k naive positions are in the naive union
    of history positions' — for ANY history/probe key sets (and no
    false negatives fall out of the spec equality for free)."""
    from hackmd_data_pipeline_spark.operators.membership import (
        bloom_build,
        bloom_might_contain,
    )

    m, k = 1 << 12, 5
    hdf = spark.createDataFrame([(x,) for x in hist], "k long")
    pdf = spark.createDataFrame([(x,) for x in probes], "k long")
    bits = bloom_build(hdf, F.col("k"), m, k)
    got = {r.k: r.bloom_pass
           for r in bloom_might_contain(pdf, bits, F.col("k"), m, k).collect()}

    hashes = {r.k: r.h for r in
              spark.createDataFrame([(x,) for x in set(hist) | set(probes)],
                                    "k long")
              .select("k", F.xxhash64("k").alias("h")).collect()}
    bitset = {p for x in hist for p in _naive_km(hashes[x], m, k)}
    want = {x: all(p in bitset for p in _naive_km(hashes[x], m, k))
            for x in probes}
    assert got == want


@SETTINGS
@given(rows=st.lists(st.tuples(st.integers(-(2**62), 2**62),
                               st.integers(1, 50)),
                     min_size=1, max_size=25, unique_by=lambda t: t[0]))
def test_cms_estimate_matches_naive_spec(spark, rows):
    """cms_estimate == min over the naive d x w counter matrix — for
    any weighted key set (the never-underestimates contract is a
    corollary of the spec equality)."""
    from hackmd_data_pipeline_spark.operators.membership import (
        cms_build,
        cms_estimate,
    )

    d, w = 4, 128
    df = spark.createDataFrame(rows, "k long, w long")
    ctr = cms_build(df, F.col("k"), F.col("w"), d, w)
    got = {r.k: r.cms_est
           for r in cms_estimate(df, ctr, F.col("k"), d, w).collect()}

    hashes = {r.k: r.h for r in
              spark.createDataFrame([(x,) for x, _ in rows], "k long")
              .select("k", F.xxhash64("k").alias("h")).collect()}
    cells: dict[tuple[int, int], int] = {}
    for x, wt in rows:
        for j, p in enumerate(_naive_km(hashes[x], w, d)):
            cells[(j, p)] = cells.get((j, p), 0) + wt
    want = {x: min(cells[(j, p)]
                   for j, p in enumerate(_naive_km(hashes[x], w, d)))
            for x, _ in rows}
    assert got == want

"""Registry-wide determinism sweep: every registered query must return
the SAME result when run twice in one session.

Motivation: the round-3 continuation caught the distributed prefix sum
returning DIFFERENT selections run-to-run — un-reused range exchanges
sampled partition boundaries with independent RDD-id-derived seeds and
corrupted the offsets (operators/prefix.py has the full story). An
oracle gate can miss that class (a flaky query can happen to match on
the gated run), so this sweep pins run-to-run stability for the whole
registry, including the rows-only queries the oracle never hashes.

Exemptions must document WHY the nondeterminism is inherent and what
other test bounds it.
"""

from __future__ import annotations

import math

import pytest

from hackmd_data_pipeline_spark.plans import REGISTRY

from .conftest import SF_SMOKE as SF_SMALL

# Inherently randomized operators (bounded by their own accuracy tests):
#   agg_kll_quantiles — the Apache DataSketches KLL sketch compacts
#   levels with an unseeded RNG, so two aggregations over identical
#   data legitimately return slightly different rank estimates; the
#   rank-error band is asserted in tests/test_queries_oracle.py::
#   test_kll_quantiles_close.
_NONDETERMINISTIC_BY_DESIGN = {"agg_kll_quantiles"}


def _canon(df):
    cols = sorted(df.columns)

    def c(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    return sorted(tuple(c(r[col]) for col in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_is_deterministic_across_runs(spark, name):
    if name in _NONDETERMINISTIC_BY_DESIGN:
        pytest.skip("randomized sketch; accuracy-band tested instead")
    first = _canon(REGISTRY[name].builder(spark, SF_SMALL))
    second = _canon(REGISTRY[name].builder(spark, SF_SMALL))
    assert first == second, (
        f"{name}: result changed between two runs in one session "
        f"({len(first)} vs {len(second)} rows)")


@pytest.fixture(scope="module")
def alt_spark(spark):
    """Sibling session (shared SparkContext, own SQL conf) with a
    different shuffle-partition count — results must not depend on it."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "3")
    return s


ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_invariant_to_shuffle_partitions(spark, alt_spark, name):
    """The oracle gate hash-checks SQL-expressible queries under the
    driver's own session config, but the 20 rows-only queries are only
    row-counted there — so pin THEIR value stability here: the same
    query under 8 vs 3 shuffle partitions must produce identical
    results. (Input-file splitting is independent of this conf, so the
    per-partition operators — packing, global ids — are exercised on
    identical input layouts; what this catches is any aggregation,
    banding, or clustering path whose VALUES leak the reducer count.)"""
    if name in _NONDETERMINISTIC_BY_DESIGN:
        pytest.skip("randomized sketch; accuracy-band tested instead")
    a = _canon(REGISTRY[name].builder(spark, SF_SMALL))
    b = _canon(REGISTRY[name].builder(alt_spark, SF_SMALL))
    assert a == b, (
        f"{name}: result depends on spark.sql.shuffle.partitions "
        f"({len(a)} vs {len(b)} rows)")

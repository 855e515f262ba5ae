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

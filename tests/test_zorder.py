"""Z-order layout: multi-column row-group pruning measured from real
parquet footer stats, against a single-column-sorted baseline.
"""

from __future__ import annotations

from hackmd_data_pipeline_spark.operators.zorder import (
    rowgroup_skip_fraction,
    write_zordered,
    zorder_key,
)
from hackmd_data_pipeline_spark.tables import load_table

from .conftest import SF_CORRECT


def test_zorder_prunes_both_columns(spark, tmp_path):
    o = load_table(spark, SF_CORRECT, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")

    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    # 32 files: curve-block granularity governs pruning resolution —
    # with 8 blocks a 2-D curve can only skip at 1/8 resolution
    write_zordered(o, zdir, ["o_custkey", "o_totalprice"], num_files=32)
    # baseline: clustered on ONE column only
    (o.repartitionByRange(32, "o_custkey").sortWithinPartitions("o_custkey")
     .write.mode("overwrite").parquet(ldir))

    # identical content
    assert (spark.read.parquet(zdir).count()
            == spark.read.parquet(ldir).count() == o.count())

    stats = o.agg({"o_custkey": "max", "o_totalprice": "max"}).collect()[0]
    ck_hi, tp_hi = stats["max(o_custkey)"], stats["max(o_totalprice)"]

    # narrow range predicates (~5% of each domain)
    ck_skip_z = rowgroup_skip_fraction(zdir, "o_custkey", 0, ck_hi * 0.05)
    tp_skip_z = rowgroup_skip_fraction(zdir, "o_totalprice", 0, tp_hi * 0.05)
    ck_skip_l = rowgroup_skip_fraction(ldir, "o_custkey", 0, ck_hi * 0.05)
    tp_skip_l = rowgroup_skip_fraction(ldir, "o_totalprice", 0, tp_hi * 0.05)

    # the single-sort baseline prunes its own sort column but nothing
    # on the other; z-order must prune meaningfully on BOTH
    assert ck_skip_l > 0.8, f"baseline should prune its sort col: {ck_skip_l}"
    assert tp_skip_l < 0.2, f"baseline can't prune the other col: {tp_skip_l}"
    assert ck_skip_z > 0.5, f"z-order custkey pruning too weak: {ck_skip_z}"
    assert tp_skip_z > 0.5, f"z-order totalprice pruning too weak: {tp_skip_z}"


def test_zorder_key_is_deterministic(spark):
    o = load_table(spark, SF_CORRECT, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    k1 = o.withColumn("k", zorder_key(o, ["o_custkey", "o_totalprice"]))
    k2 = o.withColumn("k", zorder_key(o, ["o_custkey", "o_totalprice"]))
    a = {(r.o_orderkey, r.k) for r in k1.collect()}
    b = {(r.o_orderkey, r.k) for r in k2.collect()}
    assert a == b

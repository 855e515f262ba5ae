"""Stage-level profile of the r09-regressed ANN upsert twins (VERDICT
r09 item 1): time each composed stage of sim_knn_join_ivf_upsert /
dedup_store_commit_cycle at sf0.1 to attribute the 2.5 -> 3.9-5.8 s
move to named work before touching code."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hackmd_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:45s} {dt:7.3f} s")
    return out


def main():
    spark = get_spark()
    from pyspark.sql import functions as F

    from hackmd_data_pipeline_spark.operators.similarity import (
        brute_force_topk_blocked, ivf_search_index, upsert_ivf_index,
    )
    from hackmd_data_pipeline_spark.plans.similarity import (
        _ann_recall_frame, _ensure_ivf_index, _index_cache_path,
        _upsert_delta_root,
    )
    from hackmd_data_pipeline_spark.tables import load_table

    for it in range(3):
        print(f"== sim_knn_join_ivf_upsert iter {it} ==")
        t0 = time.perf_counter()
        emb = load_table(spark, SF, "embeddings")
        base = emb.filter((F.col("vec_id") % 4).isin(1, 2))
        late = emb.filter(F.col("vec_id") % 4 == 3)
        batch = emb.filter(F.col("vec_id") % 4 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding")
        dest = _index_cache_path(SF, "knn_ivf16_b12")
        t("ensure_index(warm)", lambda: _ensure_ivf_index(base, dest, nlist=16))
        droot = _upsert_delta_root(SF, "knn_ivf16_b12")
        t("rmtree", lambda: shutil.rmtree(droot, ignore_errors=True))
        t("upsert", lambda: upsert_ivf_index(
            late, dest, epoch_id=0, delta_root=droot, out_partitions=4))
        stored = emb.filter(F.col("vec_id") % 4 != 0)
        exact = t("exact plan", lambda: brute_force_topk_blocked(stored, batch, k=10))
        ann = t("ann plan", lambda: ivf_search_index(
            spark, dest, batch, k=10, nprobe=6, delta_root=droot))
        res = t("recall frame plan", lambda: _ann_recall_frame(exact, ann, bound=0.62))
        t("collect", lambda: res.collect())
        print(f"  TOTAL {time.perf_counter() - t0:.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-stage wall-clock attribution for the slow registry entries
(r11 optimization round, guide §1: measure first).

Wraps the named operator/plan functions with timers (monkeypatch), then
runs each requested query exactly as bench.py does (builder + count)
and prints per-function cumulative seconds — a flat profile that says
WHERE inside a composed lifecycle entry the time goes (upsert vs
maintain vs search vs recall frame), which `bench.py`'s single number
cannot.

Usage:
  python scripts/profile_r11.py sim_knn_join_pointer_cycle dedup_store_commit_cycle
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_r11.py <names...>
"""
from __future__ import annotations

import functools
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("PROFILE_ITERS", "2"))

TIMES: dict[str, float] = defaultdict(float)
CALLS: dict[str, int] = defaultdict(int)
_STACK: list[str] = []


def _wrap(mod, name: str, label: str):
    fn = getattr(mod, name, None)
    if fn is None or getattr(fn, "__profiled__", False):
        return

    @functools.wraps(fn)
    def timed(*a, **kw):
        _STACK.append(label)
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            _STACK.pop()
            TIMES[label] += dt
            CALLS[label] += 1
            # subtract child time from enclosing frames -> self time
            if _STACK:
                TIMES[_STACK[-1]] -= dt

    timed.__profiled__ = True
    setattr(mod, name, timed)


def instrument():
    import hackmd_data_pipeline_spark.operators.dedup as dd
    import hackmd_data_pipeline_spark.operators.dedup_store as ds
    import hackmd_data_pipeline_spark.operators.similarity as sim
    import hackmd_data_pipeline_spark.plans.similarity as psim
    import hackmd_data_pipeline_spark.streaming.annindex as ann

    for n in ("build_ivf_index", "upsert_ivf_index", "ivf_search_index",
              "remove_vectors", "compact_ivf_index", "publish_gen_manifest",
              "load_ivf_centroids", "probe_cells", "_materialize_probe",
              "_train_quantizer", "_bounded_sample", "ivf_index_data",
              "build_ivfpq_index", "upsert_ivfpq_index", "ivfpq_search_index",
              "_pq_encoded", "_adc_scores", "_pq_finish", "_load_codebooks",
              "brute_force_topk", "brute_force_topk_blocked", "semdedup",
              "semdedup_from_index", "_centroid_df", "_train_pq_books"):
        _wrap(sim, n, f"sim.{n}")
    for n in ("build_dedup_store", "commit_batch", "commit_spans",
              "incremental_pairs", "incremental_spans", "update_clusters",
              "remove_docs", "resolve_from_store", "load_clusters",
              "load_pairs", "load_tombstones", "compact_store"):
        _wrap(ds, n, f"ds.{n}")
    for n in ("hashed_shingle_table", "minhash_signatures_from",
              "lsh_candidate_pairs", "verify_jaccard", "band_buckets",
              "dedup_clusters", "minhash_lsh_pairs", "simhash_pairs",
              "jaccard_pairs_exact", "partial_overlap_pairs",
              "exact_substring_spans", "span_hash_windows",
              "dup_span_report"):
        _wrap(dd, n, f"dd.{n}")
    for n in ("maintain_ivf_index", "run_ann_index_ingest"):
        _wrap(ann, n, f"ann.{n}")
    for n in ("_ensure_index", "_ensure_ivf_index", "_ensure_exact_topk",
              "_ensure_hashed_emb", "_ann_recall_frame",
              "_ensure_warm_store", "_ensure_warm_span_store"):
        _wrap(psim, n, f"psim.{n}")


def main():
    names = sys.argv[1:]
    if not names:
        print("usage: profile_r11.py <query> [...]", file=sys.stderr)
        sys.exit(2)

    from hackmd_data_pipeline_spark.session import get_spark

    instrument()
    from hackmd_data_pipeline_spark.plans import REGISTRY

    spark = get_spark("profile_r11")
    # warmup (mirrors bench.py)
    REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR).count()
    n_workers = spark.sparkContext.defaultParallelism

    def _noop(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches

    (spark.range(0, n_workers * 4, 1, n_workers)
     .mapInPandas(_noop, "id long").count())

    for name in names:
        for it in range(ITERS):
            TIMES.clear()
            CALLS.clear()
            spark.sparkContext.setJobDescription(f"{name}#{it}")
            t0 = time.perf_counter()
            df = REGISTRY[name].builder(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            df.count()
            total = time.perf_counter() - t0
            print(f"\n=== {name} iter {it}: total {total:.3f}s "
                  f"(builder {t_build:.3f}s, action {total - t_build:.3f}s)")
            acc = 0.0
            for label, sec in sorted(TIMES.items(), key=lambda kv: -kv[1]):
                if sec < 0.005:
                    continue
                acc += sec
                print(f"  {sec:7.3f}s x{CALLS[label]:<3} {label}")
            print(f"  {acc:7.3f}s attributed inside builder; "
                  f"{total - acc:.3f}s unattributed (action + plan glue)")
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()

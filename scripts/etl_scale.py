"""Composed-pipeline scale measurement: run the distributed heart of
CorpusPipeline (build_documents -> curate -> resolve -> finalize) over
the sf0.1 documents corpus, at 1x and REPLICAS x, and print per-stage
wall times. Collect/ingest are seeded as finished (they are API/file-
bound, not the distributed path)."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

REPL = int(os.environ.get("REPL", "1"))
SF = os.environ.get("SF", "/root/testdata/sf0.1")
ROOT = f"/tmp/etl_scale_{REPL}x"
shutil.rmtree(ROOT, ignore_errors=True)

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF}/documents.parquet")
if REPL > 1:
    reps = spark.range(REPL).select(F.col("id").alias("rep"))
    docs = (docs.crossJoin(reps)
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
            .drop("rep"))

# documents -> the canonical papers shape build_documents consumes
papers = docs.select(
    F.concat(F.lit("http://example.org/abs/"),
             F.col("doc_id").cast("string")).alias("entry_id"),
    F.substring("text", 1, 80).alias("title"),
    F.col("text").alias("summary"),
    F.coalesce(F.col("source"), F.lit("cs.LG")).alias("primary_category"),
)
papers.write.mode("overwrite").parquet(f"{ROOT}/store/papers")
n_in = spark.read.parquet(f"{ROOT}/store/papers").count()

from hackmd_data_pipeline_spark.etl import CorpusPipeline

p = CorpusPipeline(spark, ROOT, fetch=lambda cat, off: [],
                   categories=["seeded"], lsh_threshold=0.5,
                   pack_budget=1024)
# seed collect+ingest as finished so run() starts at build_documents
for stage in ("collect", "ingest"):
    p._mark(stage, "finished", 1)

stage_times = {}
t_all = time.time()
for stage in ("build_documents", "curate", "resolve", "annotate",
              "finalize"):
    t0 = time.time()
    out = getattr(p, f"_stage_{stage}")()
    p._mark(stage, "finished", 1)
    stage_times[stage] = round(time.time() - t0, 2)
    print(f"{stage}: {stage_times[stage]} s -> {out}", flush=True)
total = round(time.time() - t_all, 2)
print(f"TOTAL distributed chain ({n_in} docs, {REPL}x sf0.1): {total} s")
print({"replicas": REPL, "docs": n_in, "total_sec": total, **stage_times})

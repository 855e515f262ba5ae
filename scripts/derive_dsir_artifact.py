"""Print the frozen DSIR bucket-weight artifact (PINNED_DSIR_WEIGHTS)
derived from sf0.01 — run once at pin time; the provenance test
re-derives and asserts equality against the checked-in constant."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from hackmd_data_pipeline_spark.operators.dsir import derive_dsir_weights

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

art = derive_dsir_weights(spark, "/root/testdata/sf0.01")
print(f"# {len(art)} observed buckets")
print("PINNED_DSIR_WEIGHTS: list[tuple[int, int]] = [")
for i in range(0, len(art), 5):
    row = ", ".join(f"({b}, {w})" for b, w in art[i:i + 5])
    print(f"    {row},")
print("]")

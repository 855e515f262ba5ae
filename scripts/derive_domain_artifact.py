"""Print the frozen domain-classifier artifact (PINNED_DOMAIN_WEIGHTS)
derived from sf0.01 — run once at pin time; the provenance test
re-derives and asserts equality against the checked-in constant."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from hackmd_data_pipeline_spark.operators.textmodel import derive_domain_weights

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

art = derive_domain_weights(spark, "/root/testdata/sf0.01")
print("PINNED_DOMAIN_WEIGHTS: list[tuple[str, int]] = [")
for i in range(0, len(art), 3):
    row = ", ".join(f"({t!r}, {w})" for t, w in art[i:i + 3])
    print(f"    {row},")
print("]")

"""Simulate the external driver's correctness gate: a VANILLA
SparkSession (none of session.py's configs) + DuckDB views over the
same parquet, comparing every queries() entry against oracle_sql()
exactly as the driver does (columns sorted by name, floats as
f"{v:.6f}", rows sorted).

Usage:
  python scripts/drive_driver.py [tz|-] [query ...]
  DRIVE_SF=/root/testdata/sf0.1 python scripts/drive_driver.py
  DRIVE_HOSTILE=1 python scripts/drive_driver.py America/New_York q1 q2

DRIVE_HOSTILE=1 switches to the degenerate-config probe: local[2],
3 shuffle partitions, AQE off, ANSI off — the harshest environment a
plan can legitimately meet; combine with a tz argument for the full
hostile matrix. Expect ALL MATCH under every combination.
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("DRIVE_SF", "/root/testdata/sf0.01")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

tz = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] != "-" else None
subset = set(sys.argv[2:]) if len(sys.argv) > 2 else None

if os.environ.get("DRIVE_HOSTILE"):
    b = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "3")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.sql.ansi.enabled", "false"))
else:
    b = SparkSession.builder.master("local[8]")
if tz:
    b = b.config("spark.sql.session.timeZone", tz)
spark = b.getOrCreate()

import __spark_entry__ as entry_mod

edf = entry_mod.entry(spark)
assert len(edf.take(1)) > 0, "entry() returned 0 rows"
print("entry() ok")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6f}"
        return str(v)

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


queries = entry_mod.queries()
oracles = entry_mod.oracle_sql()
fails = []
for name, builder in queries.items():
    if subset and name not in subset:
        continue
    sdf = builder(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if name not in oracles:
        print(f"{name}: rows-only ({len(srows)} rows)")
        continue
    rel = con.sql(oracles[name])
    drows, dcols = rel.fetchall(), list(rel.columns)
    ok = (sorted(scols) == sorted(dcols) and len(srows) == len(drows)
          and normalize(srows, scols) == normalize(drows, dcols))
    print(f"{name}: {'MATCH' if ok else '*** MISMATCH ***'} ({len(srows)} rows)")
    if not ok:
        fails.append(name)
        if sorted(scols) != sorted(dcols):
            print("  cols:", scols, "vs", dcols)
        else:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            diff = [(a, b) for a, b in zip(ns, nd) if a != b]
            print("  first diffs:", diff[:3])

print("ALL MATCH" if not fails else f"FAILED: {fails}")
sys.exit(1 if fails else 0)

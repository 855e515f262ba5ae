"""Build the hostile-SKEW dataset for the drive_driver matrix (r06
VERDICT item 7): the DRIVE_HOSTILE sweep covers degenerate configs
(partitions/AQE/timezone) but not degenerate DATA — this corpus adds
the three classic skew shapes, derived deterministically from sf0.01
so both engines (Spark query + DuckDB oracle) see identical rows:

  * one HOT LANG + one boilerplate shingle above max_df: 2,000 extra
    'en' documents, each mostly-unique (unique leading token, so
    prefix-blocked edit distance does NOT collapse into one block)
    but all sharing a trailing boilerplate sentence — its shingles'
    doc frequency (2,000) blows through dedup_partial_overlap's
    max_df=12 cap, the exact case the cap exists for;
  * one HOT WINDOW KEY: a 300-doc EXACT-duplicate clique — one
    fingerprint group 300x larger than any natural group, the salted
    window's whale key (and a 300-clique for LSH/CC);
  * one HOT CUSTKEY: 15,000 extra orders all on o_custkey=1 (with
    2 lineitems for each of the first 2,500), so the orders/lineitem
    join side carries a single dominating key.

Usage:  python scripts/make_skew_corpus.py [/tmp/graft_skew_sf]
then:   DRIVE_SF=/tmp/graft_skew_sf python scripts/drive_driver.py - <queries>
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

BASE = os.environ.get("SKEW_BASE", "/root/testdata/sf0.01")
DEST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_skew_sf"

UNCHANGED = ("region", "nation", "customer", "supplier", "part",
             "events", "embeddings")

os.makedirs(DEST, exist_ok=True)
for t in UNCHANGED:
    shutil.copyfile(f"{BASE}/{t}.parquet", f"{DEST}/{t}.parquet")

con = duckdb.connect()

# documents: base + hot-lang boilerplate docs + exact-dup clique.
# Hot docs: unique leading token (u<i>q) -> distinct edit-distance
# blocks; 20+ varied body tokens drawn from the corpus vocabulary ->
# low pairwise Jaccard (no LSH clique); shared 5-token boilerplate
# tail -> df=2000 shingles. Clique docs: one identical 24-token text.
con.sql(f"""
COPY (
  SELECT * FROM read_parquet('{BASE}/documents.parquet')
  UNION ALL
  SELECT 100000 + i AS doc_id,
         t AS text, 'en' AS lang, 'hotsrc' AS source,
         LENGTH(t) AS n_chars
  FROM (
    SELECT i,
           'u' || i || 'q the w' || (i % 13) || ' scan v' || (i % 7)
           || ' data filter row key the batch g' || (i % 11)
           || ' join order m' || (i % 5) || ' value stream sort h' || (i % 17)
           || ' slow big part the vector agg x' || (i % 23)
           || ' common boilerplate footer sentence shared' AS t
    FROM (SELECT UNNEST(range(2000)) AS i)
  )
  UNION ALL
  SELECT 200000 + i AS doc_id, t AS text, 'de' AS lang,
         'hotdup' AS source, LENGTH(t) AS n_chars
  FROM (
    SELECT i,
           'order merge vector the batch join filter scan hash slow '
           || 'data group the window key column small fast stream sort '
           || 'value row part line' AS t
    FROM (SELECT UNNEST(range(300)) AS i)
  )
) TO '{DEST}/documents.parquet' (FORMAT PARQUET)
""")

# orders: base + 15,000 hot-custkey rows (new orderkeys far above the
# base range; dates/prices varied deterministically inside base range)
con.sql(f"""
COPY (
  SELECT * FROM read_parquet('{BASE}/orders.parquet')
  UNION ALL
  SELECT 10000000 + i AS o_orderkey,
         1 AS o_custkey,
         CASE i % 3 WHEN 0 THEN 'O' WHEN 1 THEN 'F' ELSE 'P' END
             AS o_orderstatus,
         ROUND(500.0 + (i % 997) * 3.25, 2) AS o_totalprice,
         TIMESTAMP '1996-01-01' + INTERVAL ((i % 1500)) DAY
             AS o_orderdate,
         CASE i % 5 WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH'
                    WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED'
                    ELSE '5-LOW' END AS o_orderpriority
  FROM (SELECT UNNEST(range(15000)) AS i)
) TO '{DEST}/orders.parquet' (FORMAT PARQUET)
""")

# lineitem: base + 2 lines for each of the first 2,500 hot orders so
# the orders<->lineitem join actually carries the hot key's weight
con.sql(f"""
COPY (
  SELECT * FROM read_parquet('{BASE}/lineitem.parquet')
  UNION ALL
  SELECT 10000000 + (i // 2) AS l_orderkey,
         (i % 200) AS l_partkey,
         (i % 100) AS l_suppkey,
         CAST(1 + (i % 2) AS INTEGER) AS l_linenumber,
         CAST(1 + (i % 50) AS DOUBLE) AS l_quantity,
         ROUND(100.0 + (i % 887) * 1.5, 2) AS l_extendedprice,
         ROUND((i % 11) * 0.01, 2) AS l_discount,
         ROUND((i % 9) * 0.01, 2) AS l_tax,
         CASE i % 3 WHEN 0 THEN 'R' WHEN 1 THEN 'A' ELSE 'N' END
             AS l_returnflag,
         CASE i % 2 WHEN 0 THEN 'O' ELSE 'F' END AS l_linestatus,
         TIMESTAMP '1996-02-01' + INTERVAL ((i % 1400)) DAY
             AS l_shipdate
  FROM (SELECT UNNEST(range(5000)) AS i)
) TO '{DEST}/lineitem.parquet' (FORMAT PARQUET)
""")

for t in ("documents", "orders", "lineitem"):
    n = con.sql(f"SELECT COUNT(*) FROM '{DEST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"skew corpus at {DEST}")

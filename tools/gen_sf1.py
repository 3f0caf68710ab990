#!/usr/bin/env python3
"""Generate a ~sf1 dataset (10x sf0.1) for the one-off scale sample
recorded in BASELINE.md. Driver-side tooling (duckdb), like check.py.

Fact tables are scaled 10x with key offsets so totals grow linearly;
dimension tables stay fixed (the realistic growth shape: 10x facts per
dimension row). Content tables are scaled WITHOUT creating cross-copy
duplicates, so dedup/ANN workloads see a 10x corpus with the SAME
duplicate/neighbor structure per copy instead of a degenerate one:
  - documents: every word in copy i>0 gets a copy-specific suffix, so
    shingles/tokens across copies are disjoint;
  - embeddings: copy i>0 vectors get a deterministic per-element jitter
    (+-0.1), so no exact-duplicate points pile into the same ANN cells.

Usage: python3 tools/gen_sf1.py [src_dir] [out_dir]
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(f"""COPY (SELECT * FROM '{src}/{t}.parquet')
                    TO '{out}/{t}.parquet' (FORMAT PARQUET)""")
    print(f"copied {t}")

COPIES = "(SELECT unnest(range(10)) AS i)"

con.execute(f"""COPY (
  SELECT l_orderkey + i * (SELECT max(l_orderkey) + 1
                           FROM '{src}/lineitem.parquet') AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet' CROSS JOIN {COPIES}
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
print("lineitem x10")

con.execute(f"""COPY (
  SELECT o_orderkey + i * (SELECT max(l_orderkey) + 1
                           FROM '{src}/lineitem.parquet') AS o_orderkey,
         o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority
  FROM '{src}/orders.parquet' CROSS JOIN {COPIES}
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
print("orders x10")

con.execute(f"""COPY (
  SELECT event_id + i * (SELECT max(event_id) + 1
                         FROM '{src}/events.parquet') AS event_id,
         ts,
         user_id + i * (SELECT max(user_id) + 1
                        FROM '{src}/events.parquet') AS user_id,
         event_type, value, props
  FROM '{src}/events.parquet' CROSS JOIN {COPIES}
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
print("events x10")

con.execute(f"""COPY (
  SELECT doc_id + i * (SELECT max(doc_id) + 1
                       FROM '{src}/documents.parquet') AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE regexp_replace(text, '([A-Za-z0-9]+)',
                                  '\\1q' || i, 'g') END AS text,
         lang, source,
         CAST(length(CASE WHEN i = 0 THEN text
              ELSE regexp_replace(text, '([A-Za-z0-9]+)',
                                  '\\1q' || i, 'g') END) AS BIGINT)
           AS n_chars
  FROM '{src}/documents.parquet' CROSS JOIN {COPIES}
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
print("documents x10")

con.execute(f"""COPY (
  SELECT vec_id + i * (SELECT max(vec_id) + 1
                       FROM '{src}/embeddings.parquet') AS vec_id,
         CASE WHEN i = 0 THEN embedding ELSE
           CAST([embedding[j] + 0.2 *
                 ((hash(vec_id * 1315423911 + i * 2654435761 + j)
                   % 1000) / 1000.0 - 0.5)
                 FOR j IN range(1, len(embedding) + 1)] AS FLOAT[])
         END AS embedding,
         label
  FROM '{src}/embeddings.parquet' CROSS JOIN {COPIES}
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
print("embeddings x10")

for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(t, n)

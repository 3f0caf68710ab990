#!/usr/bin/env python3
"""Pre-warm GRAFT_TRUTH_CACHE for the SLOW_TRUTH oracles at a given
scale factor, so the full-suite stamp later reads the materialized
truth instead of paying the deliberately-quadratic DuckDB recompute
inline. Writes EXACTLY what tools/check.py would (same cache key:
query name + SQL text + input file stats; same parquet + .types.json
sidecar; write-then-rename), so a later check.py run is a warm hit.

Usage: GRAFT_TRUTH_CACHE=<dir> python3 tools/prewarm_truth.py \
         <sf_dir> <oracle_sql.json path>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import SLOW_TRUTH, TABLES, truth_cache_path  # noqa: E402

sf = sys.argv[1]
oracle = json.load(open(sys.argv[2]))
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf}/{t}.parquet')")
for name in sorted(SLOW_TRUTH):
    if name not in oracle:
        continue
    sql = oracle[name]
    cache = truth_cache_path(name, sql, sf)
    if cache is None:
        sys.exit("set GRAFT_TRUTH_CACHE")
    if os.path.exists(cache) and os.path.getsize(cache) > 0:
        print(f"warm {name}: {cache}")
        continue
    print(f"materializing {name} -> {cache}", flush=True)
    otypes = dict((c[0], c[1])
                  for c in con.execute(f"DESCRIBE {sql}").fetchall())
    tmp = cache + f".tmp{os.getpid()}"
    con.execute(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
    ttmp = cache + f".types.tmp{os.getpid()}"
    with open(ttmp, "w") as fh:
        json.dump(otypes, fh)
    os.replace(ttmp, cache + ".types.json")
    os.replace(tmp, cache)
    print(f"done {name}", flush=True)
print("prewarm complete")

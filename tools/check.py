#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check.py <sfDir> <outDir>
It registers the harness parquet tables as DuckDB views, runs each entry of
<outDir>/oracle_sql.json, and compares against the Spark result parquet in
<outDir>/<name>/ — columns sorted by name, rows compared in emitted order
(so every query must carry a total ORDER BY).

This is a builder-side dev tool only; the shipped library is pure Scala.
"""
import sys, json, glob, math, datetime, hashlib, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Deliberately-quadratic exact-baseline truths whose one-time cost at
# sf1 exceeds any sane stamp budget. With GRAFT_TRUTH_CACHE=<dir> set,
# the oracle result materializes ONCE per (query, input fingerprint,
# SQL text) as parquet and later stamps read it back — the truth is
# still computed by DuckDB from the raw tables, never by the engine
# under test; the cache key pins both the inputs and the exact SQL, so
# any change recomputes. Unset (the driver's sf0.01 gate), nothing
# changes.
SLOW_TRUTH = {"dedup_semantic_keep"}


def truth_cache_path(name, sql, sf):
    d = os.environ.get("GRAFT_TRUTH_CACHE")
    if not d or name not in SLOW_TRUTH:
        return None
    h = hashlib.sha256()
    h.update(sql.encode())
    for t in TABLES:
        f = f"{sf}/{t}.parquet"
        if os.path.exists(f):
            st = os.stat(f)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns}".encode())
    os.makedirs(d, exist_ok=True)
    return f"{d}/{name}_{h.hexdigest()[:16]}.parquet"


def canon(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(canon(x) for x in v)
        if isinstance(v, np.generic):
            return canon(v.item())
    except ImportError:
        pass
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def fetch(con, q):
    cur = con.execute(q)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order],
            [tuple(canon(r[i]) for i in order) for r in rows])


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')")
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        flist = "[" + ",".join(f"'{f}'" for f in files) + "]"
        try:
            scols, srows = fetch(con, f"SELECT * FROM read_parquet({flist})")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_bad += 1
            continue
        cache = truth_cache_path(name, sql, sf)
        def cache_ready():
            return (cache and os.path.exists(cache)
                    and os.path.getsize(cache) > 0)
        try:
            if cache_ready():
                ocols, orows = fetch(
                    con, f"SELECT * FROM read_parquet('{cache}')")
            else:
                if cache:
                    # write-then-rename: a concurrent reader never sees
                    # a half-written truth file. Capture the oracle
                    # dtypes from DESCRIBE {sql} NOW — parquet COPY can
                    # normalize types (HUGEINT widening etc.), so warm
                    # runs must compare against the ORIGINAL SQL's
                    # types, stored in a sidecar next to the parquet.
                    otypes = dict(
                        (c[0], c[1])
                        for c in con.execute(f"DESCRIBE {sql}").fetchall())
                    tmp = cache + f".tmp{os.getpid()}"
                    con.execute(
                        f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
                    ttmp = cache + f".types.tmp{os.getpid()}"
                    with open(ttmp, "w") as fh:
                        json.dump(otypes, fh)
                    os.replace(ttmp, cache + ".types.json")
                    os.replace(tmp, cache)
                    ocols, orows = fetch(
                        con, f"SELECT * FROM read_parquet('{cache}')")
                else:
                    ocols, orows = fetch(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: schema spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        # dtype-strict schema comparison (the driver's check may be)
        st = dict((c[0], c[1]) for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({flist})").fetchall())
        if cache_ready() and os.path.exists(cache + ".types.json"):
            # warm run: the sidecar holds DESCRIBE {sql} captured at
            # cache-write time — parquet round-tripping must not be
            # allowed to soften (or harden) the dtype comparison
            ot = json.load(open(cache + ".types.json"))
        else:
            ot = dict((c[0], c[1]) for c in con.execute(
                f"DESCRIBE {sql}").fetchall())
        dtbad = [f"{c}: spark={st[c]} oracle={ot[c]}"
                 for c in sorted(st) if c in ot and st[c] != ot[c]]
        if dtbad:
            print(f"FAIL {name}: dtype mismatch {dtbad}")
            n_bad += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
            continue
        diff = next((i for i, (a, b) in enumerate(zip(srows, orows))
                     if a != b), None)
        if diff is not None:
            print(f"FAIL {name}: first diff at row {diff}")
            print(f"   cols:   {scols}")
            print(f"   spark:  {srows[diff]}")
            print(f"   oracle: {orows[diff]}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(srows)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

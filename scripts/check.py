#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sf_dir> <verify_out_dir>

For each query dir under verify_out_dir, reads the Spark-written parquet
result and the matching oracle SQL from oracle_sql.json, runs the SQL in
DuckDB with each table registered as a view over the same source parquet,
then compares: columns (sorted by name), row count, and cell values
(rows sorted by all columns for order-insensitivity; also reports whether
the original row order already matched).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    qdirs = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in qdirs:
        got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        gcols, grows = got.columns, got.fetchall()
        if name not in oracles:
            print(f"SKIP {name:24s} no oracle ({len(grows)} rows)")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name:24s} oracle SQL error: {str(e)[:200]}")
            failures += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name:24s} columns differ: spark={sorted(gcols)} oracle={sorted(ecols)}")
            failures += 1
            continue
        # align column order by name
        gidx = [gcols.index(c) for c in sorted(gcols)]
        eidx = [ecols.index(c) for c in sorted(ecols)]
        g = [tuple(norm(r[i]) for i in gidx) for r in grows]
        e = [tuple(norm(r[i]) for i in eidx) for r in erows]
        if len(g) != len(e):
            print(f"FAIL {name:24s} row count: spark={len(g)} oracle={len(e)}")
            failures += 1
            continue
        ordered = g == e
        if sorted(map(repr, g)) != sorted(map(repr, e)):
            diffs = [(a, b) for a, b in zip(sorted(map(repr, g)), sorted(map(repr, e))) if a != b]
            print(f"FAIL {name:24s} values differ ({len(diffs)} rows); first: {diffs[0] if diffs else '?'}")
            failures += 1
            continue
        print(f"OK   {name:24s} {len(g)} rows" + ("" if ordered else "  (row order differs)"))
    # An oracle entry with no result dir means the Spark query threw during
    # Verify — without this check the run could still report ALL GREEN.
    for name in sorted(set(oracles) - set(qdirs)):
        print(f"FAIL {name:24s} no Spark result written (query failed in Verify?)")
        failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

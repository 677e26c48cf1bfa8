#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sf_dir> <verify_out_dir>

For each query dir in <verify_out_dir>: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB against the
raw test tables, sort columns by name + rows by all columns, and
compare row count / schema width / value hash.
"""
import json, sys, hashlib
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) if len(sys.argv) > 3 else None

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(rel):
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(df.astype(str).values.tolist())
    h = hashlib.md5(json.dumps(rows).encode()).hexdigest()
    return len(df), list(df.columns), h

fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    try:
        sn, sc, sh = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        on, oc, oh = canon(con.sql(sql))
        ok = (sn == on) and (sc == oc) and (sh == oh)
        if not ok:
            fails += 1
        print(f"{name}: rows {sn}/{on} cols_match={sc==oc} hash_match={sh==oh} {'OK' if ok else 'FAIL'}")
        if sc != oc:
            print(f"  spark cols: {sc}\n  oracle cols: {oc}")
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sf_dir> <verify_out_dir> [query ...]

For each query dir in <verify_out_dir>: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB against the
raw test tables, sort columns by name + rows by all columns, and
compare row count / schema width / value hash.

The Spark result is canonicalized through TWO independent read paths —
DuckDB->pandas AND pyarrow->pandas — and BOTH hashes must match the
oracle. The two paths render some types differently (pyarrow keeps a
DECIMAL's ".000000" scale padding as decimal.Decimal objects; DuckDB
converts to float64 and drops it), and the driver's gate is free to
use either; a query whose output only matches under one path is a
representation bug waiting for the driver to find (it did, twice:
q_incremental_agg r8+r9, q_incremental_minmax r9).

On a hash mismatch, both row sets are dumped (up to DUMP_ROWS rows)
next to the hashes so the differing values are visible in the log.
"""
import json, sys, hashlib
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) if len(sys.argv) > 3 else None
DUMP_ROWS = 50

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon_df(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(df.astype(str).values.tolist())
    h = hashlib.md5(json.dumps(rows).encode()).hexdigest()
    return len(df), list(df.columns), h, rows

def dump(tag, rows):
    print(f"  {tag} rows (first {DUMP_ROWS}):")
    for r in rows[:DUMP_ROWS]:
        print(f"    {r}")

fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    try:
        glob_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        sn, sc, sh, srows = canon_df(con.sql(glob_sql).df())
        # second read path: pyarrow (dataset dir read skips _SUCCESS)
        pn, pc, ph, prows = canon_df(
            pq.read_table(f"{out_dir}/{name}").to_pandas())
        on, oc, oh, orows = canon_df(con.sql(sql).df())
        ok = (sn == on) and (sc == oc) and (sh == oh) and (ph == oh)
        if not ok:
            fails += 1
        tag = "" if ph == sh else f" pyarrow_hash_match={ph == oh}"
        print(f"{name}: rows {sn}/{on} cols_match={sc == oc} "
              f"hash_match={sh == oh}{tag} {'OK' if ok else 'FAIL'}")
        if sc != oc:
            print(f"  spark cols: {sc}\n  oracle cols: {oc}")
        if sn == on and sc == oc and (sh != oh or ph != oh):
            dump("spark(duckdb-read)", srows)
            if ph != sh:
                dump("spark(pyarrow-read)", prows)
            dump("oracle", orows)
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

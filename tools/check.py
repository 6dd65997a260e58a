#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same
parquet tables, then compares schema (sorted column names), row count, and
values (columns sorted by name, rows sorted, stringified).
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def s(v):
        if v is None: return "NULL"
        if isinstance(v, float):
            if math.isnan(v): return "NULL"
            return repr(v)
        return str(v)
    rows = [tuple(s(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows), list(df.columns)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        resdir = os.path.join(outdir, name)
        if not os.path.isdir(resdir): continue
        if only and name not in only: continue
        files = glob.glob(f"{resdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'").df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        grows, gcols = canon(got)
        wrows, wcols = canon(want)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); n_fail += 1; continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}"); n_fail += 1; continue
        bad = [(a, b) for a, b in zip(grows, wrows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0][0]} vs {bad[0][1]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(grows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir> [--json <path>] [query ...]

Reads each <outDir>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same
parquet tables, then compares schema (sorted column names), row count, and
values (columns sorted by name, rows sorted, stringified).

With --json <path>, additionally writes the per-query result map in the
driver's CORRECTNESS_r{N}.json schema:
  {"<name>": {"rows_match": bool, "schema_match": bool,
              "hash_match": bool, "err": str|null}, ...}
so each round's correctness sweep is auditable without the driver.
"""
import sys, json, glob, math, os, time
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
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # --time: print per-query oracle-SQL wall and the top-10 slowest at
    # the end — the driver runs each oracle standalone, so the sum here
    # approximates its sweep budget (r13 verdict #3: the driver artifact
    # came back empty twice; budget the sweep so a timeout can be ruled
    # in or out).
    timing = "--time" in argv
    if timing:
        argv.remove("--time")
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    report = {}
    walls = {}
    def rec(name, rows_match, schema_match, hash_match, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "err": err}
    for name in sorted(os.listdir(outdir)):
        resdir = os.path.join(outdir, name)
        if not os.path.isdir(resdir): continue
        if only and name not in only: continue
        files = glob.glob(f"{resdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1
            rec(name, False, False, False, "no result parquet"); continue
        got = con.sql(f"SELECT * FROM '{resdir}/*.parquet'").df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            report[name] = {"skipped": True, "rows": len(got), "err": "no oracle"}
            continue
        try:
            t0 = time.monotonic()
            want = con.sql(oracle[name]).df()
            walls[name] = time.monotonic() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1
            rec(name, False, False, False, f"oracle error {e}"); continue
        grows, gcols = canon(got)
        wrows, wcols = canon(want)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); n_fail += 1
            rec(name, len(grows) == len(wrows), False, False,
                f"columns {gcols} vs {wcols}"); continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} vs {len(wrows)}"); n_fail += 1
            rec(name, False, True, False,
                f"rows {len(grows)} vs {len(wrows)}"); continue
        bad = [(a, b) for a, b in zip(grows, wrows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0][0]} vs {bad[0][1]}")
            n_fail += 1
            rec(name, True, True, False, f"{len(bad)} mismatched rows"); continue
        print(f"PASS {name} ({len(grows)} rows)"); n_pass += 1
        rec(name, True, True, True)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if timing and walls:
        total = sum(walls.values())
        print(f"== oracle wall: {total:.1f} s over {len(walls)} statements ==")
        for name, w in sorted(walls.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {w:7.2f} s  {name}")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(report)} entries)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

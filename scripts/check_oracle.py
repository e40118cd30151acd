#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet tables and compare with the Spark parquet
output written by graft.Verify (column-name-sorted, row-sorted, value hash)."""
import duckdb, json, sys, glob, os, math

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r1"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_glob = f"{out_dir}/{name}/*.parquet"
    if not glob.glob(spark_glob):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ERROR {e}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"{name}: SCHEMA mismatch {gc} vs {ec}"); fails += 1; continue
    got = got[gc].sort_values(gc).reset_index(drop=True)
    exp = exp[ec].sort_values(ec).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"{name}: ROWS {len(got)} vs {len(exp)}"); fails += 1; continue
    ok = True
    for c in gc:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            eq = (a == b) or (isinstance(a, float) and isinstance(b, float)
                              and (a == b or (math.isnan(a) and math.isnan(b))))
            if not eq:
                print(f"{name}: VALUE mismatch col={c} row={i}: {a!r} vs {b!r}")
                ok = False; fails += 1; break
        if not ok: break
    if ok:
        print(f"{name}: OK ({len(got)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)

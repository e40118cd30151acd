#!/usr/bin/env python3
"""Two-parallelism output-equality check (north rule): compare every query's
parquet output from two graft.Verify runs executed at different
parallelism (e.g. SPARK_GRAFT_CPUS=4 vs 32). Column-name-sorted,
row-sorted, value-hash comparison — the same canonicalization as the
driver's correctness gate.

Usage:
  env SPARK_GRAFT_CPUS=4  sbt -batch "runMain graft.Verify <sfDir> /tmp/eq4"
  env SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify <sfDir> /tmp/eq32"
  python3 scripts/check_equality.py /tmp/eq4 /tmp/eq32
"""
import hashlib
import os
import sys

import duckdb
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()

def canon_hash(base, q):
    df = con.execute(f"SELECT * FROM read_parquet('{base}/{q}/*.parquet')").fetchdf()
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    return (len(df),
            hashlib.sha256(pd.util.hash_pandas_object(df, index=False)
                           .values.tobytes()).hexdigest())

# UNION of both dirs: a query that failed (wrote nothing) under one
# parallelism level must surface as a MISMATCH, not be silently skipped
# (a_dir-only listing once hid exactly that false pass)
def qs(d):
    return {q for q in os.listdir(d) if os.path.isdir(f"{d}/{q}")}
queries = sorted(qs(a_dir) | qs(b_dir))
bad = 0
for q in queries:
    try:
        (na, ha), (nb, hb) = canon_hash(a_dir, q), canon_hash(b_dir, q)
    except Exception as e:
        bad += 1
        print(f"{q}: MISMATCH (missing/unreadable on one side: {e})")
        continue
    if (na, ha) != (nb, hb):
        bad += 1
        print(f"{q}: MISMATCH rows {na} vs {nb}, hash {ha[:16]} vs {hb[:16]}")
    else:
        print(f"{q}: OK ({na} rows)")
print(f"{len(queries) - bad}/{len(queries)} queries identical across parallelism levels")
sys.exit(1 if bad else 0)

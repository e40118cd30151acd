#!/usr/bin/env python3
"""Two-parallelism scaling leg for the end-to-end corpus assembly
(`Corpus.assemble`: exact dedup -> decontamination -> skew-safe quota ->
split -> per-split packing) over 1M fixture docs with a 30%-of-rows
"whale" domain and a ~0.1% benchmark slice.

Same conventions as bench_scaling.py's sequential legs: fresh JVM per
(job, cpus), min of REPS measured reps after one warm-up, local[8] vs
local[32] on the same parquet input, efficiency = (t8/t32)/4. EPOCH RULE:
the two legs run back-to-back in one session. Own fixture dir — the
authoritative fixtures stay untouched.

Usage: python3 scripts/bench_corpus_scaling.py [reps]   (default 3)
Prepends a dated subsection to BENCH_SCALING.md and prints one JSON line.
"""
import datetime
import json
import os
import pathlib
import re
import subprocess
import sys

from _benchlib import REPO, sbt as _sbt, BENCH_MD

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
DATA_DIR = os.environ.get("GRAFT_BENCH_DIR", "/tmp/graft_bench_corpus")
N_DOCS = 1_000_000
def sbt(cmd):
    return _sbt(cmd, env_extra={"GRAFT_BENCH_DIR": DATA_DIR})


# only the docs fixture is real-sized; everything else at token size
print(sbt(f"runMain graft.BenchScaling prep 1000 16 1000 {N_DOCS} "
          "1000 10000 100 10000"), flush=True)

res = {}
for cpus in (8, 32):
    res[cpus] = sbt(f"runMain graft.BenchScaling run corpus_assemble {cpus} {REPS}")
    print(json.dumps(res[cpus]), flush=True)

a, b = res[8], res[32]
eff = (a["sec"] / b["sec"]) / 4
lines = [
    f"\n## Corpus-assembly scaling ({datetime.date.today()})\n",
    "End-to-end `Corpus.assemble` (exact dedup → 20-gram decontamination "
    "→ skew-safe quota → split → per-split packing) over "
    f"{N_DOCS // 1_000_000}M fixture docs, 30% of rows in one whale "
    "domain, ~0.1% benchmark slice. Fresh JVM per leg, min of "
    f"{REPS} reps after warm-up, one continuous session.\n",
    "| job | output rows | T(8 cores) | T(32 cores) | rows/s @8 | "
    "rows/s @32 | efficiency (T8/T32)/4 |",
    "|---|---|---|---|---|---|---|",
    f"| corpus assemble end-to-end ({N_DOCS // 1_000_000}M docs) | "
    f"{a['rows']} | {a['sec']:.2f} s | {b['sec']:.2f} s | "
    f"{N_DOCS / a['sec']:.0f} | {N_DOCS / b['sec']:.0f} | {eff:.3f} |",
    "\n(rows/s counts INPUT docs decided per second; output rows = "
    "documents surviving all five stages.)",
]
out_path = BENCH_MD
prior = out_path.read_text() if out_path.exists() else ""
sep = "\n\n---\n\n" if prior.strip() else "\n"
out_path.write_text("\n".join(lines) + sep + prior)
print(json.dumps({"bench": "corpus_scaling", "n_docs": N_DOCS, "reps": REPS,
                  "rows": a["rows"], "sec_8": a["sec"], "sec_32": b["sec"],
                  "efficiency": round(eff, 3)}), flush=True)

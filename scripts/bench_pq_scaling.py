#!/usr/bin/env python3
"""Scaling evidence for the PQ/ADC ANN path (`Ann.pqTopK`: sampled
codebook -> fused map-only corpus encode+pack (`pqEncodePacked`) ->
driver-built LUT broadcast -> per-partition ADC bounded-heap kernel ->
exact rescore of 50 survivors/query; 500 queries, ksub=256
codewords/subspace, dims=64, m=8).

Three measurements, all in ONE continuous session (EPOCH RULE —
cross-session ratios are corrupted by this host's ~35% drift):
  1. in-JVM thread-scaling leg (local[8] vs local[32], fresh JVM each,
     min of REPS after warm-up) over the full fixture — comparable to
     the main bench_scaling.py table, bounded by this socket's shared
     DRAM/L3;
  2. the executor-shaped ladder: 1/2/4 concurrent cpuset-pinned
     `local[8]` JVMs, each running the FULL pq pipeline (codebook ->
     encode -> ADC -> refine) over its own pre-split physical quarter
     shard with its own 500 queries (GRAFT_PQ_SHARD) — the honest
     N vs 4N emulation for this shuffle-free plan (book + LUT are
     broadcast; a real cluster adds only a parts x nq x R partial-top-k
     merge);
  3. same-session AluFloor/MemFloor 4-process host ceilings.

Uses its own fixture dir (/tmp/graft_bench_pq) — the authoritative
bench_scaling.py fixture is left untouched.

Usage: python3 scripts/bench_pq_scaling.py [reps]   (default 3)
Prepends a dated section to BENCH_SCALING.md and prints one JSON line.
"""
import datetime
import glob
import json
import os
import sys

from _benchlib import CPUSETS, sbt as _sbt, java_leg, shard_json, BENCH_MD

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
DATA_DIR = os.environ.get("GRAFT_BENCH_DIR", "/tmp/graft_bench_pq")
N_EMB = 6_144_000  # 4 range shards x 1.536M for the ladder
N_Q = 500  # GRAFT_PQ_NQ default; query rows disjoint from codebook rows


def sbt(cmd):
    return _sbt(cmd, env_extra={"GRAFT_BENCH_DIR": DATA_DIR})


def shard_leg(shard, cpuset, log):
    return java_leg(["graft.BenchScaling", "run", "pq_topk", "8", "1"],
                    "6g", cpuset, log, extra_jvm=["-XX:+AlwaysPreTouch"],
                    env_extra={"GRAFT_PQ_SHARD": shard,
                               "GRAFT_BENCH_DIR": DATA_DIR})


# 1. fixture: only the embeddings table (+ its quarter shards) is
# real-sized; everything else the shared prep builds is at token size
print(sbt(f"runMain graft.BenchScaling prep 1000 16 1000 1000 {N_EMB} "
          "10000 100 10000"), flush=True)

# 2. in-JVM thread-scaling leg (fresh JVM per cpus, min-of-REPS)
res = {}
for cpus in (8, 32):
    res[cpus] = sbt(f"runMain graft.BenchScaling run pq_topk {cpus} {REPS}")
    print(json.dumps(res[cpus]), flush=True)

# 3. page-cache pre-warm for the ladder shards, then the ladder with
# reps interleaved across rungs
for f in glob.glob(f"{DATA_DIR}/embeddings_shards/__shard=*/*"):
    with open(f, "rb") as fh:
        while fh.read(1 << 22):
            pass
secs = {1: [], 2: [], 4: []}
rowcounts = {}
for rep in range(REPS):
    for ways in (1, 2, 4):
        logs = [f"/tmp/pq_ladder_{ways}w_{i}_{rep}.log" for i in range(ways)]
        procs = [shard_leg(f"{i}/4", CPUSETS[i], logs[i]) for i in range(ways)]
        for p in procs:
            p.wait()
        outs = [shard_json(l) for l in logs]
        # every shard leg must answer its full query set (N_Q x k=10 rows):
        # a misconfigured shard would otherwise record a wall for less work
        for o in outs:
            assert o["rows"] == N_Q * 10, f"shard leg returned {o['rows']} rows"
        secs[ways].append(max(o["sec"] for o in outs))
        rowcounts[ways] = sum(o["rows"] for o in outs)
        print(json.dumps({"job": "pq_ladder", "ways": ways, "rep": rep,
                          "max_wall_sec": secs[ways][-1]}), flush=True)
ladder = {w: min(s) for w, s in secs.items()}

# 4. host controls, same session
java_leg(["graft.AluFloor", "8", "2"], "12g", CPUSETS[0],
         "/tmp/alu_pq_1w.log").wait()
alu_solo = shard_json("/tmp/alu_pq_1w.log")["sec"]
procs = [java_leg(["graft.AluFloor", "8", "2"], "12g", CPUSETS[i],
                  f"/tmp/alu_pq_4w_{i}.log") for i in range(4)]
for p in procs:
    p.wait()
alu_four = max(shard_json(f"/tmp/alu_pq_4w_{i}.log")["sec"] for i in range(4))
java_leg(["graft.MemFloor", "8", "2", "32"], "12g", CPUSETS[0],
         "/tmp/mem_pq_1w.log").wait()
mem_solo = shard_json("/tmp/mem_pq_1w.log")["sec"]
procs = [java_leg(["graft.MemFloor", "8", "2", "32"], "12g", CPUSETS[i],
                  f"/tmp/mem_pq_4w_{i}.log") for i in range(4)]
for p in procs:
    p.wait()
mem_four = max(shard_json(f"/tmp/mem_pq_4w_{i}.log")["sec"] for i in range(4))
alu_ceiling, mem_ceiling = alu_solo / alu_four, mem_solo / mem_four

a, b = res[8], res[32]
eff_jvm = (a["sec"] / b["sec"]) / 4
eff2, eff4 = ladder[1] / ladder[2], ladder[1] / ladder[4]
combined = {"bench": "pq_scaling", "n_emb": N_EMB, "n_q": N_Q, "reps": REPS,
            "rows": a["rows"], "sec_8": a["sec"], "sec_32": b["sec"],
            "efficiency_in_jvm": round(eff_jvm, 3),
            "ladder_solo_sec": ladder[1], "ladder_two_way_sec": ladder[2],
            "ladder_four_way_sec": ladder[4],
            "ladder_efficiency_2way": round(eff2, 3),
            "ladder_efficiency_4way": round(eff4, 3),
            "alu_4proc_ceiling": round(alu_ceiling, 3),
            "mem_4proc_ceiling": round(mem_ceiling, 3)}

lines = [
    f"\n## PQ/ADC ANN scaling ({datetime.date.today()})\n",
    "Compressed-domain ANN (`Ann.pqTopK`): deterministic sampled codebook "
    "(256 codewords x 8 subspaces) → fused map-only corpus encode+pack "
    "(`pqEncodePacked`) → driver-built LUT broadcast → per-partition ADC "
    "bounded-heap kernel → exact rescore of 50 survivors/query. "
    f"{N_Q} queries, dims=64, m=8. The measured work (encode n x ksub x "
    "dims mult-adds + ADC nq x n x m lookup-adds) runs entirely inside "
    "scan partitions — zero corpus-side exchange. One continuous session; "
    f"fresh JVM per leg; min of {REPS} reps after warm-up.\n",
    "In-JVM thread scaling (`local[8]` vs `local[32]`, same parquet "
    "input — bounded by this single socket's shared clock/L3/DRAM, like "
    "every in-JVM compute leg in the main table):\n",
    "| job | output rows | T(8 cores) | T(32 cores) | rows/s @8 | "
    "rows/s @32 | efficiency (T8/T32)/4 |",
    "|---|---|---|---|---|---|---|",
    f"| PQ/ADC top-k + exact refine ({N_Q}q x {N_EMB // 1000}k vectors) | "
    f"{a['rows']} | {a['sec']:.2f} s | {b['sec']:.2f} s | "
    f"{a['rows'] / a['sec']:.0f} | {b['rows'] / b['sec']:.0f} | "
    f"{eff_jvm:.3f} |",
    "\n(output rows = queries x k over fixed nq x n x m ADC work — the "
    "EFFICIENCY column is the scaling metric, rows/s is not comparable "
    "to the row-count legs.)",
    "\npq_topk executor-shaped ladder (the honest N vs 4N emulation for "
    "this SHUFFLE-FREE plan: 1/2/4 concurrent cpuset-pinned `local[8]` "
    "JVMs, each running the FULL pipeline — codebook → encode → ADC → "
    "refine — over its own pre-split physical quarter shard of "
    f"{N_EMB / 4_000_000:.2f}M vectors with its own {N_Q} queries; "
    "page-cache pre-warmed; reps interleaved across rungs):\n",
    f"| concurrent 8-core JVMs | vectors searched | max wall (min of "
    f"{REPS}) | weak-scaling eff vs solo |",
    "|---|---|---|---|",
    f"| 1 | {N_EMB / 4e6:.2f}M | {ladder[1]:.1f} s | 1.000 |",
    f"| 2 | {N_EMB / 2e6:.2f}M | {ladder[2]:.1f} s | {eff2:.3f} |",
    f"| 4 | {N_EMB / 1e6:.2f}M | {ladder[4]:.1f} s | {eff4:.3f} |",
    f"\n- Same-session host 4-process ceilings: pure-ALU "
    f"**{alu_ceiling:.3f}** (AluFloor {alu_solo:.1f} s solo / "
    f"{alu_four:.1f} s 4-way), pure-streaming **{mem_ceiling:.3f}** "
    f"(MemFloor {mem_solo:.1f} s / {mem_four:.1f} s). The PQ stages "
    "compute (encode argmin, ADC table adds) and stream (parquet vector "
    "scan, LUT random reads), so the rungs are bounded by a mix of the "
    "two — both are THIS socket's shared clock/L3/DRAM and vanish on a "
    "real N→4N cluster where every node brings its own.",
    f"- Per-rep walls (rung: reps): 1: "
    f"{', '.join(f'{s:.1f}' for s in secs[1])} s; "
    f"2: {', '.join(f'{s:.1f}' for s in secs[2])} s; "
    f"4: {', '.join(f'{s:.1f}' for s in secs[4])} s.",
]
prior = BENCH_MD.read_text() if BENCH_MD.exists() else ""
sep = "\n\n---\n\n" if prior.strip() else "\n"
BENCH_MD.write_text("\n".join(lines) + sep + prior)
print(json.dumps(combined), flush=True)

#!/usr/bin/env python3
"""Orchestrate the two-parallelism scaling bench: one fresh JVM per
(job, cpus) leg, aggregate to BENCH_SCALING.md + one JSON line."""
import json, os, re, subprocess, sys, datetime, pathlib
from _benchlib import (REPO, CPUSETS, last_json, sbt, java_leg, shard_json,
                       BENCH_MD)

N_IMAGES, N_POLYS, N_PAYLOAD = 30_000_000, 1000, 3_000_000
# Corpus sizes are picked so each leg's scalable work dominates its fixed
# floor (session bring-up + per-stage driver/AQE latency, ~2-6 s —
# parallelism-independent, so a leg whose @32 time approaches it measures
# the floor, not the operator; solve T(c) = F + W/c from the two points to
# see the split):
# - N_EMB: exact O(n²) triangle join; 24k vectors ran 2.7 s @32 (floor-
#   bound), 96k gives 16× the pair work (~12 s @32).
# - N_DOCS: dedupeDecision at 100k docs had W/32 ≈ 18 s against F ≈ 6 s;
#   300k triples W for the same F.
# - N_KNN_PTS: the ring loop pays ~6 driver-synchronized stage barriers per
#   round regardless of data (measured ~2.5-3 s/round at BOTH 8 and 32
#   cores on 10M points, where total work is only ~70 core-s); 100M points
#   gives the rounds real work per barrier.
# N_KNN_Q at 100k (was 10k): the triangle-seeded finisher + warm kNN path
# made the whole 10k-query leg run in 14-20 s @32, i.e. at the per-round
# machinery floor (~5 s/round of driver barriers + cached-scan streams at
# EITHER core count) — the efficiency metric was measuring the floor, not
# the operator. 10x the queries gives every round query-proportional work
# that dwarfs the floor, per the sizing rule above.
N_DOCS, N_EMB, N_KNN_PTS, N_KNN_Q = 300_000, 96_000, 100_000_000, 100_000
JOBS = [("join_cells", "spatial-join (cell equi-join + PIP refine) + tiling"),
        ("join_rtree", "spatial-join (broadcast R-tree, zero shuffle) + tiling"),
        ("decode", "image decode + feature extraction (columnar)"),
        ("decode_scan", "decode floor: payload scan only (no decode)"),
        ("decode_kernel", "decode kernel: columnar scan + inflate only"),
        ("pbf_scan", "OSM PBF planet decode (160M dense nodes, distributed blob fan-out)"),
        ("dedupe_decision", f"dedupeDecision end-to-end ({N_DOCS//1000}k docs: LSH+verify+CC)"),
        ("emb_pairs", f"exact embedding near-dup triangle join ({N_EMB//1000}k vectors)"),
        ("pq_topk", f"PQ/ADC top-k + exact refine (500q x {N_EMB//1000}k vectors)"),
        ("knn_ring", f"cell-ring kNN (k=10, {N_KNN_Q//1000}k queries / {N_KNN_PTS//1_000_000}M points)"),
        ("knn_ring_bucketed", f"cell-ring kNN, bucketBy(cell) ingest layout (same {N_KNN_Q//1000}k/{N_KNN_PTS//1_000_000}M input)")]
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

# Resume: GRAFT_BENCH_RESUME=<stdout log of a prior partial run> reuses its
# completed leg JSONs (one per line) instead of re-measuring them. A full
# run is ~80 min of fresh-JVM legs; a crash in the ladder tail must not
# throw the sequential legs away. Delete a leg's line from the resume log
# to force its re-measurement.
CACHE, LADDER_CACHE, CTRL_CACHE = {}, {}, {}
_resume = os.environ.get("GRAFT_BENCH_RESUME")
if _resume and os.path.exists(_resume):
    for _line in open(_resume):
        for _m in re.finditer(r'\{[^{}]*\}', _line):
            try:
                _d = json.loads(_m.group(0))
            except ValueError:
                continue
            if _d.get("job", "").endswith("_scale_out") and "max_wall_secs" in _d:
                LADDER_CACHE[(_d["job"], _d["ways"])] = _d["max_wall_secs"]
            elif _d.get("job") in ("alu_scale_out", "mem_scale_out"):
                CTRL_CACHE[_d["job"]] = _d
            elif "job" in _d and "cpus" in _d and "sec" in _d:
                CACHE[(_d["job"], _d["cpus"])] = _d
    # EPOCH-SAFE resume: every published RATIO must pair numbers from one
    # session (the LADDERS note — this host drifts ~35% between sessions,
    # and a cached fast-epoch leg against a fresh slow-epoch one once
    # produced a bogus 0.956). So reuse is ALL-OR-NOTHING per ratio:
    # - an in-JVM (job) pair is reused only if BOTH core counts are cached;
    # - a ladder is reused only if ALL rungs (1, 2, 4) are cached;
    # - the host controls are reused only if BOTH ladders were fully cached
    #   (the report reads ladder rungs against the controls).
    for _job in {j for j, _ in CACHE}:
        if not ((_job, 8) in CACHE and (_job, 32) in CACHE):
            CACHE.pop((_job, 8), None); CACHE.pop((_job, 32), None)
            print(f"[resume] dropped partial pair {_job} (epoch rule)",
                  file=sys.stderr)
    _full_ladders = True
    for _name in ("knn_scale_out", "rtree_scale_out"):
        if not all((_name, w) in LADDER_CACHE for w in (1, 2, 4)):
            _full_ladders = False
            for w in (1, 2, 4):
                if LADDER_CACHE.pop((_name, w), None) is not None:
                    print(f"[resume] dropped partial ladder {_name} "
                          "(epoch rule)", file=sys.stderr)
    if not _full_ladders and CTRL_CACHE:
        CTRL_CACHE.clear()
        print("[resume] dropped cached host controls: a ladder is being "
              "re-measured, controls must come from its session "
              "(epoch rule)", file=sys.stderr)

def leg_of(job, cpus, reps, main="graft.BenchScaling"):
    if (job, cpus) in CACHE:
        return CACHE[(job, cpus)]
    if main == "graft.BenchScaling":
        return sbt(f"runMain {main} run {job} {cpus} {reps}")
    return sbt(f"runMain {main} {cpus} {reps}")

sbt(f"runMain graft.BenchScaling prep {N_IMAGES} {N_POLYS} {N_PAYLOAD} "
    f"{N_DOCS} {N_EMB} {N_KNN_PTS} {N_KNN_Q}")

res = {}
for job, _ in JOBS:
    for cpus in (8, 32):
        leg = leg_of(job, cpus, REPS)
        res[(job, cpus)] = leg
        print(json.dumps(leg), flush=True)

# dedupe per-stage attribution legs (cumulative prefixes of dedupe_decision;
# consecutive deltas at a core count are marginal stage costs) + the
# emb_pairs replication/shuffle isolation leg. One rep: these exist to
# attribute the end-to-end numbers, not to be one.
DEDUPE_STAGES = ["dedupe_sig", "dedupe_cand", "dedupe_verify"]
for job in DEDUPE_STAGES + ["emb_repl", "pbf_kernel", "pbf_pruned", "pbf_write"]:
    for cpus in (8, 32):
        # min-of-2: a single rep's host noise can make a cumulative-prefix
        # MARGINAL go negative (observed on the CC stage)
        leg = leg_of(job, cpus, 2)
        res[(job, cpus)] = leg
        print(json.dumps(leg), flush=True)
# host ALU-scaling floor (pure thread pool, zero Spark): the ceiling any
# ALU-saturated leg (emb_pairs) can reach on ONE socket at 8 vs 32 threads.
for cpus in (8, 32):
    leg = leg_of("alu_floor", cpus, 2, main="graft.AluFloor")
    res[("alu_floor", cpus)] = leg
    print(json.dumps(leg), flush=True)

# kNN executor-shaped scale-OUT (weak scaling). The (T8/T32)/4 column
# conflates operator scaling with one socket's shared DRAM bus + L3 (32
# threads share what 8 had — see the ALU-floor note), but the north rule's
# N->4N criterion is about adding EXECUTORS, each with its own memory
# system. Closest sandbox emulation, biased AGAINST us (the 4 JVMs still
# share the one socket a real cluster would not): 1 JVM local[8] answering
# ALL queries over a quarter of the points (GRAFT_KNN_SHARD = point_id mod
# 4) vs 4 CONCURRENT JVMs local[8] over the four disjoint quarters. 4x the
# data in the same wall-clock is perfect weak scaling; a real 4N cluster
# would add one ~(queries x k x 4)-row merge shuffle of the partial top-ks.
# Each emulated executor-JVM is PINNED to its own 8-core cpuset (what
# YARN/k8s gives a real executor). Unpinned, every "8-core" JVM sees
# availableProcessors=32 and sizes G1/JIT/netty helper pools for the whole
# socket — 4 JVMs spawn ~4x oversized helper fleets a real cluster never
# has, and threads migrate across all 32 cores.
# (cpuset pinning, raw-java concurrent legs, and the add-opens list live
# in scripts/_benchlib.py — shared by all four bench scripts)

def shard_leg(job, envvar, shard, cpuset, log):
    # 6g pre-touched heap: the quarter-shard legs need ~4g, and
    # AlwaysPreTouch moves ALL heap fault service before the measured
    # region — a long-lived executor faults its heap once at startup, but
    # a fresh benchmark JVM otherwise pays it mid-job, and this
    # hypervisor SERIALIZES fault service across concurrent JVMs (it was
    # most of the 4-way round-0 gap: 14-19 s vs 6.8 s solo unpre-touched,
    # 8.7-12.1 s vs 6.3 s pre-touched).
    return java_leg(["graft.BenchScaling", "run", job, "8", "1"],
                    "6g", cpuset, log, extra_jvm=["-XX:+AlwaysPreTouch"],
                    env_extra={envvar: shard})

# Two ladders: kNN (the operator whose in-JVM ratio is most socket-bound)
# and the broadcast R-tree join — the NORTH-RULE HEADLINE metric, whose
# plan is shuffle-free (broadcast polygons, local scan splits), so the
# quarter-shard emulation models N vs 4N executors exactly.
#
# EPOCH RULE: every ratio in the report must pair numbers from ONE
# continuous run. This host drifts ~35% between sessions (measured: rtree
# solo min-of-2 4.37 s overnight vs 5.87 s the next morning; the pure-ALU
# 4-process control itself moved 0.783 → 0.955) — topping up a cached
# ladder with extra reps from a later session lets a fast-epoch solo pair
# with a slow-epoch concurrent leg (or vice versa: a 2-way rep measured
# 4.57 s in a slow epoch against the fast epoch's 4.37 solo → a bogus
# 0.956), so rep counts here must NOT exceed what the resume log's epoch
# measured. Delete the ladder lines from the resume log to re-measure a
# full fresh epoch instead.
LADDERS = [("knn_scale_out", "knn_ring", "GRAFT_KNN_SHARD", 2),
           ("rtree_scale_out", "join_rtree", "GRAFT_JOIN_SHARD", 2)]
ladders = {}  # name -> {ways: min over reps of (max wall over the JVMs)}
for name, job, envvar, nreps in LADDERS:
    ladder = {}
    for ways in (1, 2, 4):
        # a cached rung is used AS-IS: topping it up with fresh reps would
        # mix epochs inside one rung (min() across a ~35% host drift)
        secs = (list(LADDER_CACHE[(name, ways)]) if (name, ways) in LADDER_CACHE
                else [])
        for r in range(len(secs), nreps if not secs else len(secs)):
            logs = [f"/tmp/{name}_{ways}w_{i}_{r}.log" for i in range(ways)]
            procs = [shard_leg(job, envvar, f"{i}/4", CPUSETS[i], logs[i])
                     for i in range(ways)]
            for p in procs:
                p.wait()
            secs.append(max(shard_json(l)["sec"] for l in logs))
        ladder[ways] = min(secs)
        print(json.dumps({"job": name, "ways": ways,
                          "max_wall_secs": secs}), flush=True)
    ladders[name] = ladder
ladder = ladders["knn_scale_out"]
scale_out_eff = ladder[1] / ladder[4]
# Pure-compute multi-process control: the same AluFloor kernel as 1 process
# @8 threads vs 4 concurrent processes @8 threads. The 4 processes share
# nothing but the socket, so THIS ratio is the host's own ceiling for ANY
# 4-process run (all-core sustained frequency + shared core resources) —
# read the kNN ladder against it, not against 1.0.
def alu_leg(cpuset, log):
    return java_leg(["graft.AluFloor", "8", "2"], "12g", cpuset, log)
if "alu_scale_out" in CTRL_CACHE:
    # same-epoch rule (see LADDERS note): reuse the resume log's controls so
    # ladder/control ratios come from one continuous session
    alu_solo = CTRL_CACHE["alu_scale_out"]["solo_sec"]
    alu_four = CTRL_CACHE["alu_scale_out"]["four_way_max_sec"]
else:
    alu_leg(CPUSETS[0], "/tmp/alu_scaleout_1w.log").wait()
    alu_solo = shard_json("/tmp/alu_scaleout_1w.log")["sec"]
    alu_procs = [alu_leg(CPUSETS[i], f"/tmp/alu_scaleout_4w_{i}.log")
                 for i in range(4)]
    for p in alu_procs:
        p.wait()
    alu_four = max(shard_json(f"/tmp/alu_scaleout_4w_{i}.log")["sec"]
                   for i in range(4))
alu_ceiling = alu_solo / alu_four
print(json.dumps({"job": "alu_scale_out", "solo_sec": alu_solo,
                  "four_way_max_sec": alu_four,
                  "ceiling": round(alu_ceiling, 3)}), flush=True)
# Streaming control: same 1-proc vs 4-proc shape, private 256 MB/thread
# sequential sums (graft.MemFloor) — caps what table STREAMING can reach.
def mem_leg(cpuset, log):
    # 32 passes = 64 GB per run: the default 4-pass walls are ~0.2 s, which
    # quantizes the solo/4-way ratio (the fix bench_rtree_ladder.py already
    # carries — MemFloor's own doc calls the short walls unstable)
    return java_leg(["graft.MemFloor", "8", "2", "32"], "12g", cpuset, log)
if "mem_scale_out" in CTRL_CACHE:
    mem_solo = {"sec": CTRL_CACHE["mem_scale_out"]["solo_sec"],
                "gb_per_s": CTRL_CACHE["mem_scale_out"]["gb_per_s_solo"]}
    mem_four = CTRL_CACHE["mem_scale_out"]["four_way_max_sec"]
else:
    mem_leg(CPUSETS[0], "/tmp/mem_scaleout_1w.log").wait()
    mem_solo = shard_json("/tmp/mem_scaleout_1w.log")
    mem_procs = [mem_leg(CPUSETS[i], f"/tmp/mem_scaleout_4w_{i}.log")
                 for i in range(4)]
    for p in mem_procs:
        p.wait()
    mem_four = max(shard_json(f"/tmp/mem_scaleout_4w_{i}.log")["sec"]
                   for i in range(4))
mem_ceiling = mem_solo["sec"] / mem_four
print(json.dumps({"job": "mem_scale_out", "solo_sec": mem_solo["sec"],
                  "four_way_max_sec": mem_four,
                  "gb_per_s_solo": mem_solo["gb_per_s"],
                  "ceiling": round(mem_ceiling, 3)}), flush=True)

combined = {"bench": "scaling", "n_images": N_IMAGES, "n_polys": N_POLYS,
            "n_payload": N_PAYLOAD, "n_docs": N_DOCS, "n_emb": N_EMB,
            "n_knn_pts": N_KNN_PTS, "n_knn_q": N_KNN_Q}
lines = [f"\n## Scaling evidence ({datetime.date.today()})\n",
         "Same job, same parquet input, one fresh JVM per leg, min of "
         f"{REPS} measured runs (warm-up excluded): `local[8]` vs `local[32]`"
         " — the sandbox substitute for N vs 4N executors.\n",
         "Every ratio below pairs numbers from ONE continuous run session:"
         " this host drifts ~35% between sessions (the pure-ALU 4-process"
         " control alone moved 0.783 → 0.955 overnight-to-morning), so"
         " cross-session mins would silently corrupt ratios; absolute"
         " seconds are comparable only within the section.\n",
         "| job | output rows | T(8 cores) | T(32 cores) | rows/s @8 | rows/s @32 | efficiency (T8/T32)/4 |",
         "|---|---|---|---|---|---|---|"]
for job, desc in JOBS:
    a, b = res[(job, 8)], res[(job, 32)]
    eff = (a["sec"] / b["sec"]) / 4
    combined[job] = {"rows": a["rows"], "sec_8": a["sec"], "sec_32": b["sec"],
                     "rows_per_sec_8": round(a["rows"] / a["sec"]),
                     "rows_per_sec_32": round(b["rows"] / b["sec"]),
                     "efficiency": round(eff, 3)}
    lines.append(f"| {desc} | {a['rows']} | {a['sec']:.2f} s | {b['sec']:.2f} s | "
                 f"{a['rows']/a['sec']:.0f} | {b['rows']/b['sec']:.0f} | {eff:.3f} |")

# decode decomposition: the payload scan saturates the single host's
# memory bus (one shared DRAM controller) — subtracting that floor shows
# how the decode WORK itself scales, which is what multiplies out on a
# cluster where every executor brings its own memory bus.
s8 = res[("decode_scan", 8)]["sec"];  s32 = res[("decode_scan", 32)]["sec"]
k8 = res[("decode_kernel", 8)]["sec"]; k32 = res[("decode_kernel", 32)]["sec"]
kw_eff = ((k8 - s8) / (k32 - s32)) / 4 if k32 > s32 else float("nan")
# kNN straggler instrumentation (VERDICT r03 #8): rounds explored and
# queries remaining per round — separates plan cost from host noise.
knn_notes = []
for cpus in (8, 32):
    tr = res[("knn_ring", cpus)].get("knn_rounds")
    if tr:
        z = res[("knn_ring", cpus)].get("knn_z")
        knn_notes.append(f"- cell-ring kNN @{cpus} cores: density-picked z={z} "
                         f"(Knn.pickZoom), rounds (round:queries_remaining): {tr}")
if knn_notes:
    lines += ["\nkNN cell-ring round trace (adaptive radius + geometric doubling):"] + knn_notes
combined["knn_scale_out"] = {
    "solo_sec": ladder[1], "two_way_sec": ladder[2], "four_way_sec": ladder[4],
    "efficiency_2way": round(ladder[1] / ladder[2], 3),
    "efficiency_4way": round(scale_out_eff, 3),
    "alu_4proc_ceiling": round(alu_ceiling, 3)}
rl = ladders["rtree_scale_out"]
combined["rtree_scale_out"] = {
    "solo_sec": rl[1], "two_way_sec": rl[2], "four_way_sec": rl[4],
    "efficiency_2way": round(rl[1] / rl[2], 3),
    "efficiency_4way": round(rl[1] / rl[4], 3)}
lines += [
    "\nkNN executor-shaped scale-out (weak scaling — the N vs 4N executor shape):",
    "- The table's (T8/T32)/4 column conflates operator scaling with this single"
    " socket's shared DRAM bus and L3 (32 threads share what 8 had; see the"
    " ALU-floor note below). The north rule's N→4N criterion is about adding"
    " executors, each bringing its own memory system — so the honest sandbox"
    " emulation is more JVMs, not more threads in one JVM.",
    "- Harness (biased AGAINST us — the JVMs still share the one socket's L3 +"
    " DRAM bus a real cluster would not): each JVM is `local[8]`, pinned to its"
    " own 8-core cpuset (as YARN/k8s pins a real executor), answering all 100k"
    " queries over its own PHYSICAL quarter of the points (pre-split shard"
    " directories, as a real executor reads only its own partition;"
    " `GRAFT_KNN_SHARD`). The JVMs share nothing logically — no common driver,"
    " no shuffle, no lock — so any departure from flat wall-clock is hardware"
    " contention, not the operator. A real 4N cluster adds one"
    " ~(queries × k × 4)-row merge shuffle of the partial top-ks.",
    "\n| concurrent 8-core JVMs | points processed | max wall | weak-scaling eff vs solo |",
    "|---|---|---|---|",
    f"| 1 | 25M | {ladder[1]:.1f} s | 1.000 |",
    f"| 2 | 50M | {ladder[2]:.1f} s | {ladder[1]/ladder[2]:.3f} |",
    f"| 4 | 100M | {ladder[4]:.1f} s | {scale_out_eff:.3f} |",
    "\nBroadcast R-tree join + tiling, same executor-shaped ladder — the"
    " NORTH-RULE HEADLINE metric. This plan is SHUFFLE-FREE (polygons"
    " broadcast to every executor, image scan splits are node-local), so"
    " the quarter-shard harness models N vs 4N executors exactly: a real"
    " cluster adds zero cross-node traffic to this plan.",
    "\n| concurrent 8-core JVMs | images joined | max wall | weak-scaling eff vs solo |",
    "|---|---|---|---|",
    f"| 1 | {N_IMAGES//4_000_000}M | {rl[1]:.1f} s | 1.000 |",
    f"| 2 | {N_IMAGES//2_000_000}M | {rl[2]:.1f} s | {rl[1]/rl[2]:.3f} |",
    f"| 4 | {N_IMAGES//1_000_000}M | {rl[4]:.1f} s | {rl[1]/rl[4]:.3f} |",
    f"\n- Read the rtree 4-way number against the host's own 4-process"
    f" ceilings below (pure-ALU {alu_ceiling:.3f}, pure-streaming"
    f" {mem_ceiling:.3f}): the join both computes (R-tree probe + PIP"
    " refine) and streams (parquet scan, ~200M joined rows materialized"
    " per JVM), so its weak-scaling efficiency is bounded by a mix of the"
    " two ceilings — both of which are THIS socket's shared clock/L3/DRAM"
    " and vanish on a real N→4N cluster where every node brings its own.",
    f"\n- Pure-compute control (`graft.AluFloor`, zero Spark, fixed workload per"
    f" process): 1 process @8 threads = {alu_solo:.1f} s vs max over 4 concurrent"
    f" = {alu_four:.1f} s → the host's own 4-process compute ceiling is"
    f" **{alu_ceiling:.3f}** — no 4-process run of ANY kind scales past it on"
    " this socket. On a real N→4N cluster each node keeps its own clock, L3"
    " and DRAM bus, so the ceiling term vanishes there.",
    f"- Streaming control (`graft.MemFloor`, zero Spark, private 256 MB/thread"
    f" sequential sums): 1 process @8 threads = {mem_solo['gb_per_s']:.0f} GB/s;"
    f" 4 concurrent processes → 4-process streaming ceiling"
    f" **{mem_ceiling:.3f}**.",
]
lines += [
    "\nThroughput-column caveats: `dedupe_decision` rows = corpus docs (one",
    "decision per doc); `emb_pairs` rows = near-dup pairs found over fixed",
    "O(n²) compute; `pq_topk` rows = output rows (queries x k) over fixed",
    "nq x n x m ADC work; `decode_scan` \"rows\" = payload BYTES scanned (so its",
    "rows/s columns are bytes/s — do not compare them to the row-count",
    "legs) — for all four, the EFFICIENCY column is the scaling metric.",
    "\nDecode decomposition (same fresh-JVM min-of-N legs):",
    f"- payload scan alone moves {res[('decode_scan', 8)]['rows']/1e9*1:.1f} GB and runs "
    f"{s8:.2f} s @8 vs {s32:.2f} s @32 (efficiency {(s8/s32)/4:.3f}) — the single-host "
    "DRAM/page-cache floor; it is the denominator's wall, not the operator's.",
    f"- decode kernel minus that floor: ({k8:.2f}−{s8:.2f}) / ({k32:.2f}−{s32:.2f}) s "
    f"→ work-scaling efficiency **{kw_eff:.3f}**.",
    "- On a multi-executor cluster the stage is embarrassingly parallel (no shuffle) "
    "and each executor reads from its own bus/disks, so the kernel number is the "
    "one that extrapolates.",
]
# PBF decomposition: wire kernel (no row emission) vs the full scan.
pk8 = res[("pbf_kernel", 8)]["sec"]; pk32 = res[("pbf_kernel", 32)]["sec"]
ps8 = res[("pbf_scan", 8)]["sec"]; ps32 = res[("pbf_scan", 32)]["sec"]
pbf_rows = res[("pbf_scan", 8)]["rows"]
pbf_emit_eff = ((ps8 - pk8) / (ps32 - pk32)) / 4 if ps32 > pk32 else float("nan")
combined["pbf_kernel"] = {"sec_8": pk8, "sec_32": pk32,
                          "efficiency": round((pk8 / pk32) / 4, 3)}
pp8 = res[("pbf_pruned", 8)]["sec"]; pp32 = res[("pbf_pruned", 32)]["sec"]
combined["pbf_pruned"] = {"sec_8": pp8, "sec_32": pp32,
                          "efficiency": round((pp8 / pp32) / 4, 3)}
lines += [
    "\nOSM PBF decomposition (same fixture; scan and kernel measured in one session):",
    f"- wire kernel (zlib inflate + varint/zigzag/delta decode of every dense array,"
    f" no row emission): {pk8:.2f} s @8 vs {pk32:.2f} s @32 (efficiency"
    f" {(pk8/pk32)/4:.3f}; {pbf_rows/pk32/1e6:.0f}M nodes/s @32).",
    f"- pruned DSv2 scan (spark.read.format(\"osmpbf\").select(id, lon, lat) —"
    f" column pruning SKIPS the tags/info/stringtable wire sections):"
    f" {pp8:.2f} s @8 vs {pp32:.2f} s @32 ({pbf_rows/pp32/1e6:.0f}M nodes/s @32,"
    f" {ps8/pp8:.1f}× the full-schema scan @8).",
    f"- distributed part sink (decode → range shuffle → parallel"
    f" encode+deflate → part files): {res[('pbf_write', 8)]['sec']:.1f} s @8 vs"
    f" {res[('pbf_write', 32)]['sec']:.1f} s @32"
    f" ({pbf_rows/res[('pbf_write', 32)]['sec']/1e6:.1f}M nodes/s @32) — the"
    " encoder is the cost (string table + deflate per part), and every"
    " partition encodes its own part with zero coordination, so the sink"
    " multiplies out with executors.",
    f"- InternalRow emit minus that kernel: ({ps8:.2f}−{pk8:.2f}) /"
    f" ({ps32:.2f}−{pk32:.2f}) s → efficiency **{pbf_emit_eff:.3f}** —"
    " allocation-bound, the same row-materialization floor every"
    " object-emitting leg hits on this shared socket. The blob fan-out"
    " itself is embarrassingly parallel (each executor reads + inflates"
    " only its own blob ranges, zero coordination), so on a real cluster"
    " the kernel number is the one that extrapolates.",
]
# dedupeDecision decomposition: cumulative prefixes -> marginal stage costs.
d = {(j, c): res[(j, c)]["sec"] for j in DEDUPE_STAGES + ["dedupe_decision"]
     for c in (8, 32)}
lines += ["\ndedupeDecision decomposition (cumulative stage prefixes; marginal = delta):",
          "| stage (marginal) | T(8) | T(32) | efficiency |", "|---|---|---|---|"]
prev8, prev32 = 0.0, 0.0
for j, label in [("dedupe_sig", "shingle pack + minhash signatures"),
                 ("dedupe_cand", "LSH banding → candidate pairs"),
                 ("dedupe_verify", "exact Jaccard verify (packed)"),
                 ("dedupe_decision", "connected components + keep flags")]:
    m8, m32 = d[(j, 8)] - prev8, d[(j, 32)] - prev32
    eff = (m8 / m32) / 4 if m32 > 0 else float("nan")
    lines.append(f"| {label} | {m8:.2f} s | {m32:.2f} s | {eff:.3f} |")
    prev8, prev32 = d[(j, 8)], d[(j, 32)]
lines.append("\n(Single-rep prefixes vs a min-of-N end-to-end leg: a stage's marginal"
             " time can carry one rep's host noise — read efficiencies, not seconds.)")
# emb_pairs decomposition: replication+shuffle leg (no kernel) vs end-to-end.
r8 = res[("emb_repl", 8)]["sec"]; r32 = res[("emb_repl", 32)]["sec"]
e8 = res[("emb_pairs", 8)]["sec"]; e32 = res[("emb_pairs", 32)]["sec"]
k_eff = ((e8 - r8) / (e32 - r32)) / 4 if e32 > r32 else float("nan")
combined["emb_repl"] = {"sec_8": r8, "sec_32": r32,
                        "efficiency": round((r8 / r32) / 4, 3)}
a8 = res[("alu_floor", 8)]; a32 = res[("alu_floor", 32)]
alu_eff = (a8["sec"] / a32["sec"]) / 4
combined["alu_floor"] = {"sec_8": a8["sec"], "sec_32": a32["sec"],
                         "ns_per_pair_per_core_8": a8["ns_per_pair_per_core"],
                         "ns_per_pair_per_core_32": a32["ns_per_pair_per_core"],
                         "efficiency": round(alu_eff, 3)}
lines += [
    "\nemb_pairs decomposition (replication/shuffle leg = same quantize →"
    " short-pack → per-block-blob fan-out → identity-partitioned shuffle,"
    " fully read back, no pair kernel):",
    f"- replication+shuffle alone: {r8:.2f} s @8 vs {r32:.2f} s @32 "
    f"(efficiency {(r8/r32)/4:.3f}).",
    f"- O(n²) kernel minus that wire: ({e8:.2f}−{r8:.2f}) / ({e32:.2f}−{r32:.2f}) s "
    f"→ work-scaling efficiency **{k_eff:.3f}**.",
    f"- host ALU ceiling (`graft.AluFloor`, bare thread pool, zero Spark, the"
    f" identical dot kernel): {a8['sec']:.2f} s @8 ({a8['ns_per_pair_per_core']:.0f}"
    f" ns/pair/core) vs {a32['sec']:.2f} s @32 ({a32['ns_per_pair_per_core']:.0f}"
    f" ns/pair/core) → thread-scaling efficiency **{alu_eff:.3f}** — the 8→32"
    " ceiling of ANY ALU-saturated kernel on this one socket (sustained"
    " all-core frequency + shared core resources). On an N→4N cluster each"
    " node keeps its own clock, so this term vanishes; read the emb_pairs"
    " kernel efficiency against this number, not against 1.0.",
]
# Prepend the new section; keep prior rounds' sections below for history.
out_path = BENCH_MD
prior = out_path.read_text() if out_path.exists() else ""
sep = "\n\n---\n\n" if prior.strip() else "\n"
out_path.write_text("\n".join(lines) + sep + prior)
print(json.dumps(combined))

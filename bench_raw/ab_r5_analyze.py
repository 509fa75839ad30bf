#!/usr/bin/env python3
"""Paired analysis of the interleaved HEAD-vs-r3 bench session (ab_r5.sh).

Reads bench_raw/ab_r5/{head,r3}_<i>.json + probes.jsonl and prints a
per-pair table (e2e, stage walls, scoring CPU, GC, bandwidth probes,
foreign host CPU) plus the paired deltas. The paired delta is the
decision rule: host weather hits both sides of a pair roughly equally,
so a consistent sign across pairs is a real code-level difference.
"""
import json, glob, os, sys

d = os.path.join(os.path.dirname(__file__), "ab_r5")

def load(side, i):
    p = f"{d}/{side}_{i}.json"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.loads(f.read())

probes = {}
if os.path.exists(f"{d}/probes.jsonl"):
    for line in open(f"{d}/probes.jsonl"):
        r = json.loads(line)
        probes[(r["side"], r["iter"])] = r

rows = []
for i in (1, 2, 3, 4, 5):
    for side in ("head", "r3"):
        j = load(side, i)
        if not j:
            continue
        q = j["queries"]
        pr = probes.get((side, i), {})
        rows.append({
            "side": side, "iter": i,
            "e2e": q.get("pir_e2e"),
            "block": q.get("pir_blocking"),
            "score": q.get("pir_scoring"),
            "clust": q.get("pir_clustering"),
            "pairs_s": q.get("pir_pairs_per_sec"),
            "cpu": j.get("task_cpu_s"),
            "gc": j.get("task_gc_s"),
            "score_cpu": (j.get("stage_cpu_s") or {}).get("scoring"),
            "host_cpu": j.get("host_busy_cpu_s"),
            "proc_cpu": j.get("proc_cpu_s"),
            "bw0": j.get("mem_bw_gbps_start") or pr.get("bw_gbps_before"),
            "bw1": j.get("mem_bw_gbps_end") or pr.get("bw_gbps_after"),
            "q1": q.get("q1_pricing_summary"),
        })

cols = ["side", "iter", "e2e", "block", "score", "clust", "pairs_s",
        "cpu", "gc", "score_cpu", "host_cpu", "proc_cpu", "bw0", "bw1", "q1"]
print(" ".join(f"{c:>9}" for c in cols))
for r in rows:
    print(" ".join(
        f"{r[c]:>9}" if isinstance(r[c], (str, type(None))) else f"{r[c]:>9.1f}"
        for c in cols))

pairs = {}
for r in rows:
    pairs.setdefault(r["iter"], {})[r["side"]] = r
print("\npaired deltas (head - r3; negative = HEAD faster):")
for i, p in sorted(pairs.items()):
    if "head" in p and "r3" in p:
        h, r3 = p["head"], p["r3"]
        def dd(k):
            return (h[k] - r3[k]) if (h[k] is not None and r3[k] is not None) else None
        print(f"  pair {i}: e2e {dd('e2e'):+8.1f} s   scoring {dd('score'):+8.1f} s   "
              f"scoring_cpu {dd('score_cpu'):+8.1f}   gc {dd('gc'):+7.1f}   "
              f"bw(head {h['bw0']}/{h['bw1']} vs r3 {r3['bw0']}/{r3['bw1']})")

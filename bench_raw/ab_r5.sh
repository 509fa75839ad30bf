#!/bin/bash
# Interleaved HEAD-vs-round-3 A/B bench session (round-4 verdict task #1).
#
# Alternates full Bench runs of HEAD and the round-3 commit (5f97ace,
# checked out as a git worktree at .ab_r3) in ONE session, >= 3 pairs,
# identical invocation and heap as the driver path (sbt runMain, 48g,
# 32 cores, sf0.1). Host "weather" (neighbor-VM DRAM contention) then
# cancels pairwise: the PAIRED delta decides regression vs noise from
# the artifacts alone. Every run is bracketed by a direct STREAM-triad
# memory-bandwidth probe (graft.tools.MemBwProbe) — HEAD's Bench also
# embeds the probe in its own JSON (mem_bw_gbps_start/end); the r3
# Bench predates it, so the external readings cover both sides.
#
# Outputs: bench_raw/ab_r5/{head,r3}_<i>.json (+ .log), probes.jsonl.
set -u
cd /root/repo
OUT=/root/repo/bench_raw/ab_r5
mkdir -p "$OUT"
PROBE_CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/scala-library-2.13.17.jar"

probe() {
  java -cp "$PROBE_CP" graft.tools.MemBwProbe 2>/dev/null | grep -o '[0-9.]*'
}

run_side() { # side iter
  local side=$1 i=$2 dir
  dir=$([ "$side" = head ] && echo /root/repo || echo /root/repo/.ab_r3)
  local json="$OUT/${side}_$i.json"
  local b0 b1 t0 t1
  b0=$(probe)
  t0=$(date +%s)
  (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$json" \
      timeout 3000 sbt -batch "runMain graft.Bench" >"$json.log" 2>&1)
  t1=$(date +%s)
  b1=$(probe)
  echo "{\"side\":\"$side\",\"iter\":$i,\"bw_gbps_before\":$b0,\"bw_gbps_after\":$b1,\"wall_s\":$((t1-t0))}" \
    >>"$OUT/probes.jsonl"
  echo "[$side $i] wall=$((t1-t0))s bw_before=$b0 bw_after=$b1"
}

for i in 1 2 3; do
  run_side head "$i"
  run_side r3 "$i"
done
echo done

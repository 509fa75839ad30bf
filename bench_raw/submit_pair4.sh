#!/bin/bash
# N-vs-4N real-executor pair: spark-submit graft.Bench against a local
# standalone master, 1×2-core vs 4×2-core executor JVMs on the same
# input (BASELINE.md §13 protocol). Usage:
#   bench_raw/submit_pair.sh <sf_dir> <tag>
# Produces bench_raw/submit_1x2_<tag>.json and submit_4x2_<tag>.json
# (Bench honors SPARK_GRAFT_BENCH_OUT), plus executor stderr logs under
# /tmp/spark-work for the per-executor dict-build lines.
set -euo pipefail
SF=${1:-/root/testdata/sf0.1}
TAG=${2:-x}
cd /root/repo

export SPARK_LOG_DIR=/tmp/spark-logs SPARK_PID_DIR=/tmp/spark-pids SPARK_WORKER_DIR=/tmp/spark-work
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR"
/opt/spark/sbin/stop-worker.sh >/dev/null 2>&1 || true
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1 || true
/opt/spark/sbin/start-master.sh -h localhost -p 7077 --webui-port 0
/opt/spark/sbin/start-worker.sh spark://localhost:7077 -c 32 -m 100g --webui-port 0
sleep 3

JAR=$(ls target/scala-2.13/*.jar | head -1)
run() { # total-cores out-suffix
  local CORES=$1 OUT=$2
  rm -rf /tmp/graft_bench_ck
  SPARK_GRAFT_MASTER=spark://localhost:7077 \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CORES" \
  SPARK_GRAFT_BENCH_OUT="bench_raw/submit_${OUT}_${TAG}.json" \
  /opt/spark/bin/spark-submit \
    --class graft.Bench --master spark://localhost:7077 \
    --executor-cores 4 --executor-memory 20g \
    --total-executor-cores "$CORES" \
    --driver-memory 8g \
    "$JAR" > "bench_raw/submit_${OUT}_${TAG}.log" 2>&1
  grep -o '"window":"[a-z]*"' "bench_raw/submit_${OUT}_${TAG}.json" || true
}

run 4 1x4
run 16 4x4

# per-executor dict builds (fixed-cost evidence)
grep -h "dict view built" /tmp/spark-work/*/*/stderr 2>/dev/null | sort | uniq -c | tail -20 || true
/opt/spark/sbin/stop-worker.sh >/dev/null 2>&1 || true
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1 || true

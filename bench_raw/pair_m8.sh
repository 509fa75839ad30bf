#!/bin/bash
# Topology control for the 8->32 attribution: 1x8 vs 4x8 executors
# (total 8 vs 32 cores, executor shape held at 8). If 4x8 shows the
# same ~0.5 efficiency as local[32] vs local[8], the ceiling follows
# TOTAL SOCKET THREADS, not JVM topology — the direct proof that the
# 8->32 residual is the one-socket DRAM wall a real 4N-executor
# cluster does not share.
set -uo pipefail
cd /root/repo
export SPARK_LOG_DIR=/tmp/spark-logs SPARK_PID_DIR=/tmp/spark-pids SPARK_WORKER_DIR=/tmp/spark-work
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR"
/opt/spark/sbin/stop-worker.sh >/dev/null 2>&1 || true
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1 || true
/opt/spark/sbin/start-master.sh -h localhost -p 7077 --webui-port 0
/opt/spark/sbin/start-worker.sh spark://localhost:7077 -c 32 -m 100g --webui-port 0
sleep 3
JAR=$(ls target/scala-2.13/*.jar | head -1)
run() { # $1 total-cores  $2 out-json
  SPARK_GRAFT_MASTER=spark://localhost:7077 \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$1" \
  SPARK_GRAFT_BENCH_OUT="$2" \
  /opt/spark/bin/spark-submit \
    --class graft.Bench --master spark://localhost:7077 \
    --executor-cores 8 --executor-memory 20g \
    --total-executor-cores "$1" \
    --driver-memory 8g \
    "$JAR" > "${2%.json}.log" 2>&1
}
run 32 "bench_raw/submit_4x8_m1.json"
echo "4x8: $(grep -o '"window":"[a-z]*"' bench_raw/submit_4x8_m1.json || echo missing)"
run 8 "bench_raw/submit_1x8_m1.json"
echo "1x8: $(grep -o '"window":"[a-z]*"' bench_raw/submit_1x8_m1.json || echo missing)"
/opt/spark/sbin/stop-worker.sh >/dev/null 2>&1 || true
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1 || true
echo PAIR_M_DONE

#!/bin/bash
# Hunt a CLEAN-window 4x2-executor bench run: retry the 4x2 arm of
# submit_pair.sh up to $1 times (default 4), stop at the first artifact
# that self-classifies "window":"clean". Artifacts land in
# bench_raw/submit_4x2_h<i>.json either way (degraded ones are weather
# evidence, BASELINE.md round-5 protocol).
set -uo pipefail
N=${1:-4}
SF=${2:-/root/testdata/sf0.1}
cd /root/repo

export SPARK_LOG_DIR=/tmp/spark-logs SPARK_PID_DIR=/tmp/spark-pids SPARK_WORKER_DIR=/tmp/spark-work
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR"
/opt/spark/sbin/stop-worker.sh >/dev/null 2>&1 || true
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1 || true
/opt/spark/sbin/start-master.sh -h localhost -p 7077 --webui-port 0
/opt/spark/sbin/start-worker.sh spark://localhost:7077 -c 32 -m 100g --webui-port 0
sleep 3
JAR=$(ls target/scala-2.13/*.jar | head -1)

for i in $(seq 1 "$N"); do
  OUT="bench_raw/submit_4x2_h${i}.json"
  SPARK_GRAFT_MASTER=spark://localhost:7077 \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT="$OUT" \
  /opt/spark/bin/spark-submit \
    --class graft.Bench --master spark://localhost:7077 \
    --executor-cores 2 --executor-memory 20g \
    --total-executor-cores 8 \
    --driver-memory 8g \
    "${JAR}" > "bench_raw/submit_4x2_h${i}.log" 2>&1
  W=$(grep -o '"window":"[a-z]*"' "$OUT" || echo missing)
  echo "attempt $i: $W"
  if [[ "$W" == '"window":"clean"' ]]; then break; fi
  sleep 60
done
/opt/spark/sbin/stop-worker.sh >/dev/null 2>&1 || true
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1 || true

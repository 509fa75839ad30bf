#!/bin/bash
# Round-5 pair l-series: hunt a clean 4x2 under the FOREIGN-sys
# classifier (commit baaaffb), then run the paired 1x2 arm in the same
# session so host weather cancels pairwise. Artifacts:
# bench_raw/submit_4x2_i<n>.json / submit_1x2_l1.json.
set -uo pipefail
N=${1:-3}
SF=/root/testdata/sf0.1
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
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$1" \
  SPARK_GRAFT_BENCH_OUT="$2" \
  /opt/spark/bin/spark-submit \
    --class graft.Bench --master spark://localhost:7077 \
    --executor-cores 2 --executor-memory 20g \
    --total-executor-cores "$1" \
    --driver-memory 8g \
    "$JAR" > "${2%.json}.log" 2>&1
}

CLEAN=0
for i in $(seq 1 "$N"); do
  OUT="bench_raw/submit_4x2_l${i}.json"
  run 8 "$OUT"
  W=$(grep -o '"window":"[a-z]*"' "$OUT" || echo missing)
  echo "4x2 attempt $i: $W"
  if [[ "$W" == '"window":"clean"' ]]; then CLEAN=1; break; fi
  sleep 45
done
# paired 1x2 arm regardless (pairwise delta is the point)
run 2 "bench_raw/submit_1x2_l1.json"
echo "1x2: $(grep -o '"window":"[a-z]*"' bench_raw/submit_1x2_l1.json || echo missing)"
/opt/spark/sbin/stop-worker.sh >/dev/null 2>&1 || true
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1 || true
echo "PAIR_I_DONE clean4x2=$CLEAN"

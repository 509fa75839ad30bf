#!/bin/bash
# Round-5 follow-up hunter: one clean 32-core record from a fresh
# calendar day (reproducibility evidence, VERDICT r4 open question).
# Same discipline as auto_trio.sh — fire only on a clean loaded probe,
# count only a self-certified-clean artifact, archive every attempt.
set -u
cd /root/repo
SPARKCP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

probe_clean() {
  local out
  out=$(java -cp "$SPARKCP" graft.tools.Weather 2>/dev/null)
  echo "$out" >>bench_raw/weather.jsonl
  [[ "$out" == *'"window":"clean"'* ]]
}

busy_with_builds() { awk '{exit !($1 > 4)}' /proc/loadavg; }

tries=${1:-40}
for ((i = 0; i < tries; i++)); do
  if busy_with_builds; then
    sleep 240
    continue
  fi
  if probe_clean; then
    ts=$(date +%H%M%S)
    out="bench_raw/hunt_32_${ts}.json"
    echo "[hunt_32] $(date -u +%T) firing -> $out"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$out" \
      java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "$SPARKCP" graft.Bench >/dev/null 2>"bench_raw/hunt_32_${ts}.log"
    if grep -q '"window":"clean"' "$out" 2>/dev/null; then
      echo "[hunt_32] CLEAN: $out"
      exit 0
    fi
    echo "[hunt_32] degraded (archived): $out"
  fi
  sleep 240
done
echo "[hunt_32] no clean window in $tries probes"
exit 1

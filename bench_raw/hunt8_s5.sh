#!/bin/bash
set -u
cd /root/repo
N=${1:-3}
SPARKCP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for ((i = 1; i <= N; i++)); do
  W=$(java -cp "$SPARKCP" graft.tools.Weather 2>/dev/null)
  echo "$W" >>bench_raw/weather.jsonl
  if ! grep -q '"window":"clean"' <<<"$W"; then
    echo "probe $i: degraded — wait"; sleep 240; continue
  fi
  TS=$(date +%H%M%S)
  OUT="bench_raw/auto_8_s5h_${TS}.json"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
    SPARK_GRAFT_BENCH_OUT="$OUT" \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$SPARKCP" graft.Bench >/dev/null 2>"bench_raw/auto_8_s5h_${TS}.log"
  R=$(grep -o '"window":"[a-z]*"' "$OUT" || echo missing)
  V=$(grep -o '"value":[0-9.]*' "$OUT" | head -1)
  echo "attempt $i: $R $V"
  if grep -q '"window":"clean"' "$OUT"; then
    VAL=$(python3 -c "import json;print(json.load(open('$OUT'))['value'])")
    python3 -c "exit(0 if $VAL < 93.7 else 1)" && { echo "NEW 8CORE RECORD $VAL"; exit 0; }
  fi
  sleep 60
done
echo HUNT8_DONE

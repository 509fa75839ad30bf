#!/bin/bash
# Opportunistic 32-core record harvest: probe host weather every ~4 min;
# when a probe reads clean, run ONE 32-core bench arm (the arm that keeps
# landing in degraded windows) and stop as soon as an arm self-classifies
# clean. Artifacts bench_raw/auto_32_k<i>.json — raw runs all kept,
# committable only if "window":"clean" (BASELINE.md round-5 selection rule).
set -u
cd /root/repo
N=${1:-6}
SPARKCP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
PROBECP="target/scala-2.13/classes:/opt/spark/jars/scala-library-2.13.17.jar"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for ((i = 1; i <= N; i++)); do
  W=$(java -cp "$PROBECP" graft.tools.Weather 2>/dev/null)
  echo "$W" >>bench_raw/weather.jsonl
  if ! grep -q '"window":"clean"' <<<"$W"; then
    echo "probe $i: degraded — wait"
    sleep 240
    continue
  fi
  OUT="bench_raw/auto_32_k${i}.json"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="$OUT" \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$SPARKCP" graft.Bench >/dev/null 2>"bench_raw/auto_32_k${i}.log"
  R=$(grep -o '"window":"[a-z]*"' "$OUT" || echo missing)
  V=$(grep -o '"value":[0-9.]*' "$OUT" | head -1)
  echo "attempt $i: $R $V"
  grep -q '"window":"clean"' "$OUT" && { echo HARVEST32_CLEAN; exit 0; }
  sleep 120
done
echo HARVEST32_EXHAUSTED

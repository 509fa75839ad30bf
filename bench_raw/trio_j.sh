#!/bin/bash
# Round-5 final trio refresh under the FOREIGN-sys classifier
# (commit baaaffb): in local mode the driver JVM's own kernel time
# (all executor threads) previously counted as host contamination —
# re-record the 32/8/2 trio with self sys subtracted. One attempt per
# core count per invocation; artifacts bench_raw/auto_<c>_j<i>.json.
set -u
cd /root/repo
I=${1:-1}
SPARKCP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for c in 32 8 2; do
  OUT="bench_raw/auto_${c}_j${I}.json"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$c \
    SPARK_GRAFT_BENCH_OUT="$OUT" \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$SPARKCP" graft.Bench >/dev/null 2>"bench_raw/auto_${c}_j${I}.log"
  W=$(grep -o '"window":"[a-z]*"' "$OUT" || echo missing)
  echo "${c}-core: $W"
done
echo TRIO_J_DONE

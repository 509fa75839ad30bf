#!/bin/bash
# Interleaved GC/heap A/B/C on the local[32] bench: the 4x8-executor
# record burned 1,124 core-s task CPU with 24 s GC on 20 GB heaps while
# no 48 GB single-JVM run has gone below 1,386 — is heap size/GC config
# a controllable part of that gap? Arms alternate back-to-back so host
# weather cancels pairwise (the round-4 verdict's interleaving rule).
#   A: -Xmx48g (status quo, G1)   B: -Xmx20g (G1)   C: -Xmx48g +UseParallelGC
set -u
cd /root/repo
ROUNDS=${1:-2}
SPARKCP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
run() { # $1 arm-name $2 heap $3 extra-jvm-flags
  local OUT="bench_raw/gcab_${1}.json"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="$OUT" \
    java $ADDOPENS -Xmx"$2" $3 -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$SPARKCP" graft.Bench >/dev/null 2>"bench_raw/gcab_${1}.log"
  echo "$1: $(grep -o '"window":"[a-z]*"' "$OUT") e2e=$(grep -o '"pir_e2e":[0-9.]*' "$OUT")"
}
for ((i = 1; i <= ROUNDS; i++)); do
  run "a$((i+2))" 48g ""
  run "b$((i+2))" 20g ""
  run "c$((i+2))" 48g "-XX:+UseParallelGC"
done
echo GCAB_DONE

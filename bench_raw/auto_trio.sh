#!/bin/bash
# Auto-record the bench trio in the first certified-clean host window.
#
# Round-5 lesson: steal is load-dependent, so the precondition is a
# clean LOADED Weather probe (20-s all-core burn, steal_under_load
# reason) — not the idle sweep. On a clean probe the script fires the
# 32-core Bench immediately via plain `java` (no sbt warmup — windows
# have closed inside sbt startup before), then 8, then 2, re-probing
# between runs. A run only counts if its own artifact self-classifies
# "window":"clean"; otherwise it is archived as weather evidence and
# the wait resumes. Exits after one complete clean trio.
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

run_bench() { # $1 = cores
  local c=$1 ts out
  ts=$(date +%H%M%S)
  out="bench_raw/auto_${c}_${ts}.json"
  echo "[auto_trio] $(date -u +%T) firing ${c}-core bench -> $out"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$c \
    SPARK_GRAFT_BENCH_OUT="$out" \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$SPARKCP" graft.Bench >/dev/null 2>bench_raw/auto_${c}_${ts}.log
  if grep -q '"window":"clean"' "$out" 2>/dev/null; then
    echo "[auto_trio] ${c}-core run CLEAN: $out"
    return 0
  fi
  echo "[auto_trio] ${c}-core run degraded (archived): $out"
  return 1
}

busy_with_builds() {
  # don't fire (or even probe) while the session's own sbt/test JVMs
  # run — in-guest load never shows as steal, so a probe could read
  # clean and the fired bench would carry foreign user CPU instead.
  # We are the only tenant in this guest, so 1-min loadavg > 4 at
  # probe time means our own builds are running (idle box sits < 1).
  awk '{exit !($1 > 4)}' /proc/loadavg
}

need=(32 8 2)
tries=${1:-120} # probe attempts (~4 min apart => ~8 h max)
for ((i = 0; i < tries && ${#need[@]} > 0; i++)); do
  if busy_with_builds; then
    sleep 210
    continue
  fi
  if probe_clean; then
    c=${need[0]}
    if run_bench "$c"; then
      need=("${need[@]:1}")
      continue # re-probe immediately for the next core count
    fi
  fi
  sleep 210
done
if ((${#need[@]} == 0)); then
  echo "[auto_trio] COMPLETE clean trio recorded"
else
  echo "[auto_trio] gave up with remaining: ${need[*]}"
fi

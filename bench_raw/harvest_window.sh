#!/bin/bash
# Harvest ONE clean host window for everything round 5 still wants
# measured, in priority order: (1) the 32-core lz4-vs-zstd codec pair
# (CPU side of BASELINE finding #11 — the byte side is already
# window-independent), (2) a refreshed 8- and 2-core trio record with
# the new per-stage shuffle-byte fields. Fires only on a clean LOADED
# Weather probe (load-dependent-steal lesson); each artifact
# self-classifies and is archived either way; stops after one full
# harvest or when tries run out.
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

run_bench() { # $1 = cores, $2 = codec, $3 = tag
  local c=$1 codec=$2 tag=$3 ts out
  ts=$(date +%H%M%S)
  out="bench_raw/hv_${tag}_${ts}.json"
  echo "[harvest] $(date -u +%T) firing ${c}-core $codec -> $out"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$c \
    SPARK_GRAFT_IO_CODEC=$codec SPARK_GRAFT_BENCH_OUT="$out" \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$SPARKCP" graft.Bench >/dev/null 2>"bench_raw/hv_${tag}_${ts}.log"
  if grep -q '"window":"clean"' "$out" 2>/dev/null; then
    echo "[harvest] $tag CLEAN"
    return 0
  fi
  echo "[harvest] $tag degraded (archived)"
  return 1
}

# priority queue of (cores codec tag); an item is retired only when its
# run self-classifies clean
queue=("32 lz4 32lz4" "32 zstd 32zstd" "8 lz4 8lz4" "2 lz4 2lz4")
tries=${1:-70}
for ((i = 0; i < tries && ${#queue[@]} > 0; i++)); do
  if busy_with_builds; then
    sleep 180
    continue
  fi
  if probe_clean; then
    set -- ${queue[0]}
    if run_bench "$1" "$2" "$3"; then
      queue=("${queue[@]:1}")
      continue # re-probe immediately for the next item
    fi
  fi
  sleep 180
done
if ((${#queue[@]} == 0)); then echo "[harvest] COMPLETE"; else echo "[harvest] remaining: ${queue[*]}"; fi

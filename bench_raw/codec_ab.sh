#!/bin/bash
# Interleaved shuffle-codec A/B at 32 cores: lz4 (default) vs zstd for
# spark.io.compression.codec — the round-5 VERDICT's remaining 8→32
# DRAM lever. Interleaving within one window makes host weather cancel
# pairwise (ab_r5 method); the new stage_shuffle_{w,r}_gb fields give a
# window-INDEPENDENT bytes-moved denominator. Fires only on a clean
# LOADED Weather probe; every artifact is archived either way.
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

busy_with_builds() {
  awk '{exit !($1 > 4)}' /proc/loadavg
}

run_bench() { # $1 = codec tag, $2 = SPARK_GRAFT_IO_CODEC value, $3 = pair index
  local tag=$1 codec=$2 p=$3 ts out
  ts=$(date +%H%M%S)
  out="bench_raw/codec_${tag}_p${p}_${ts}.json"
  echo "[codec_ab] $(date -u +%T) firing 32-core $tag -> $out"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_IO_CODEC=$codec SPARK_GRAFT_BENCH_OUT="$out" \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$SPARKCP" graft.Bench >/dev/null 2>"bench_raw/codec_${tag}_p${p}_${ts}.log"
  grep -q '"window":"clean"' "$out" 2>/dev/null
}

pairs=${1:-2}
tries=${2:-60}
done_pairs=0
for ((i = 0; i < tries && done_pairs < pairs; i++)); do
  if busy_with_builds; then
    sleep 180
    continue
  fi
  if probe_clean; then
    # alternate order across pairs so warm-page-cache effects cancel too
    if ((done_pairs % 2 == 0)); then
      run_bench lz4 lz4 $done_pairs
      c1=$?
      run_bench zstd zstd $done_pairs
      c2=$?
    else
      run_bench zstd zstd $done_pairs
      c1=$?
      run_bench lz4 lz4 $done_pairs
      c2=$?
    fi
    if ((c1 == 0 && c2 == 0)); then
      echo "[codec_ab] pair $done_pairs CLEAN on both sides"
    else
      echo "[codec_ab] pair $done_pairs carried degradation (archived)"
    fi
    done_pairs=$((done_pairs + 1))
  else
    sleep 180
  fi
done
echo "[codec_ab] finished with $done_pairs pairs"

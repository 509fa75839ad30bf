#!/bin/bash
# Poll the host-weather probe (graft.tools.Weather) every ~5 min and
# append each reading to bench_raw/weather.jsonl. A clean reading is
# the signal to re-record the bench trio (BASELINE.md round-5 §6
# selection rule: committable records must self-classify clean).
set -u
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/scala-library-2.13.17.jar"
N=${1:-60}
for ((i = 0; i < N; i++)); do
  java -cp "$CP" graft.tools.Weather 2>/dev/null >>bench_raw/weather.jsonl
  sleep 300
done

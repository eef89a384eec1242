#!/bin/bash
# Single-kill delay sweep: for each delay d, run g52 (HITS) under
# local-cluster[2,4,2048], kill ONE executor at t=+d after executor
# grant, assert the run completes and output is present. Prints one
# line per trial: d, kill-observed, per-query failure, output-present.
# Env: MODE=replica|noreplica
cd /root/repo
MODE=${MODE:-replica}
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[2,4,2048]' SPARK_GRAFT_CPUS=8
if [ "$MODE" = "noreplica" ]; then export SPARK_GRAFT_CKPT_NO_REPLICA=1; fi
for D in 6 9 12 15 18 21; do
  OUT=/tmp/vsweep_${MODE}_${D}
  LOG=/tmp/vsweep.log
  rm -rf "$OUT" "$LOG"
  GRAFT_MEM=4g tools/run-bare.sh graft.Verify /root/testdata/sf0.01 "$OUT" g52_ >"$LOG" 2>&1 &
  PID=$!
  for _ in $(seq 60); do
    N=$(pgrep -fc CoarseGrainedExecutorBackend)
    [ "${N:-0}" -ge 2 ] && break
    sleep 1
  done
  sleep "$D"
  V=$(pgrep -f CoarseGrainedExecutorBackend | head -1)
  KILLED=no
  if [ -n "$V" ]; then
    if kill -0 $PID 2>/dev/null; then
      kill -9 "$V" 2>/dev/null && KILLED=yes
    fi
  fi
  wait $PID
  LOST=$(grep -cE "Lost executor" "$LOG")
  FAILQ=$(grep -cE "\[verify\].*failed" "$LOG")
  OK=no
  [ -d "$OUT/g52_hits" ] && OK=yes
  echo "MODE=$MODE d=$D killed=$KILLED lost=$LOST queryfail=$FAILQ output=$OK"
done

#!/bin/bash
# Executor-death resilience smoke (r12 verdict ask #8).
#
# Runs a heavy-query subset of the gate under local-cluster (2 real
# executor JVMs), SIGKILLs one executor mid-run, and asserts the run
# still completes with oracle-exact output — i.e. Spark's task retry +
# standalone executor re-launch + lineage recompute carry the engine
# through the loss of an executor (and its shuffle files) with no
# correctness drift. This is the single-box stand-in for the failure a
# 1000-executor cluster sees hourly.
#
# The kill is timed off OUTPUT PROGRESS, not a fixed sleep: we wait for
# the first query's parquet dir to land (so the victim holds live task
# state + shuffle output for a later query) and kill while the next
# query is running.
#
# Usage: tools/executor-kill-check.sh [sfDir] [queries]
#   default sfDir /root/testdata/sf0.01 (oracle-gated), queries = the
#   heavy tail the verdict named: g64 (SCC), g52 (HITS), p130 (LSH
#   endgame), plus g18 (GraphX CC) for an iterative-RDD shape.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
QUERIES=${2:-g18_,g52_,g64_,p130_}
OUT=/tmp/vkill
LOG=/tmp/vkill_run.log
rm -rf "$OUT" "$LOG"
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[2,4,2048]' SPARK_GRAFT_CPUS=8
GRAFT_MEM=4g tools/run-bare.sh graft.Verify "$SF" "$OUT" "$QUERIES" \
  >"$LOG" 2>&1 &
PID=$!

# wait for both executor JVMs
for _ in $(seq 60); do
  N=$(pgrep -fc CoarseGrainedExecutorBackend || true)
  [ "${N:-0}" -ge 2 ] && break
  sleep 1
done
echo "[kill-check] $(pgrep -fc CoarseGrainedExecutorBackend) executors up"

# wait until KILL_AFTER queries have finished (their output dirs exist),
# then the run is mid-flight in a later query — kill an executor now.
# Varying KILL_AFTER moves the kill into a different query family.
AFTER=${KILL_AFTER:-1}
for _ in $(seq 300); do
  DONE=$(ls -d "$OUT"/*/ 2>/dev/null | wc -l)
  kill -0 $PID 2>/dev/null || break
  [ "${DONE:-0}" -ge "$AFTER" ] && break
  sleep 1
done
VICTIM=$(pgrep -f CoarseGrainedExecutorBackend | head -1)
if [ -n "${VICTIM:-}" ] && kill -0 $PID 2>/dev/null; then
  kill -9 "$VICTIM"
  echo "[kill-check] SIGKILLed executor JVM $VICTIM after $DONE/$(echo "$QUERIES" | tr ',' '\n' | grep -c .) queries done"
else
  echo "[kill-check] FAIL: no executor to kill or run already over"
  exit 2
fi

wait $PID; RC=$?
echo "[kill-check] Verify exit=$RC"
if [ $RC -ne 0 ]; then
  echo "[kill-check] FAIL: Verify did not survive the executor death"
  tail -20 "$LOG"
  exit 1
fi
grep -q "failed:" "$LOG" && { echo "[kill-check] FAIL: per-query failure in log"; grep "failed:" "$LOG"; exit 1; }

# oracle-exact content check (the same gate the driver runs)
python3 tools/check.py "$SF" "$OUT"
CRC=$?
if [ $CRC -eq 0 ]; then
  echo "[kill-check] PASS: executor death absorbed; all outputs oracle-exact"
fi
exit $CRC

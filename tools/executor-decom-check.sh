#!/bin/bash
# Graceful executor DECOMMISSION sweep (r13 verdict ask #5) — the
# complement of the SIGKILL harness: instead of losing an executor and
# its blocks outright, the executor is asked to leave (SIGPWR, the
# standalone decommission signal) with storage decommissioning ON, so
# its RDD + shuffle blocks MIGRATE to the surviving executor before it
# exits. The engine-side claim under test: the lckpt DISK_ONLY_2
# replicas make this the cheap case — every checkpoint block already
# has a live second copy, so migration only has to move the singles
# (shuffle files, unreplicated cache) and the query completes without
# any recompute-from-lineage stall, oracle-exact.
#
# Usage: tools/executor-decom-check.sh [sfDir] [queries]
#   DECOM_AFTER=N decommissions after N query output dirs exist
#   (default 1 — mid-flight in the second query, same timing convention
#   as executor-kill-check.sh).
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
QUERIES=${2:-g52_,g64_,p130_}
OUT=/tmp/vdecom
LOG=/tmp/vdecom_run.log
rm -rf "$OUT" "$LOG"
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[2,4,2048]' SPARK_GRAFT_CPUS=8
T0=$(date +%s)
# snapshot FOREIGN executors (a concurrent cluster run on the box) so
# the victim pick below can never hit another app's executor — the
# first version SIGPWR'd a concurrently-running bench's executor and
# then "passed" without its own app ever decommissioning anything
PRE=$(pgrep -f CoarseGrainedExecutorBackend | sort || true)
GRAFT_MEM=4g GRAFT_JVM_OPTS="-Dspark.decommission.enabled=true \
 -Dspark.storage.decommission.enabled=true \
 -Dspark.storage.decommission.rddBlocks.enabled=true \
 -Dspark.storage.decommission.shuffleBlocks.enabled=true" \
  tools/run-bare.sh graft.Verify "$SF" "$OUT" "$QUERIES" \
  >"$LOG" 2>&1 &
PID=$!

own_executors() {
  comm -13 <(echo "$PRE") <(pgrep -f CoarseGrainedExecutorBackend | sort) 2>/dev/null
}
for _ in $(seq 60); do
  N=$(own_executors | wc -l)
  [ "${N:-0}" -ge 2 ] && break
  sleep 1
done
echo "[decom-check] $(own_executors | wc -l) own executors up ($(pgrep -fc CoarseGrainedExecutorBackend || true) total on box)"

AFTER=${DECOM_AFTER:-1}
for _ in $(seq 300); do
  DONE=$(ls -d "$OUT"/*/ 2>/dev/null | wc -l)
  kill -0 $PID 2>/dev/null || break
  [ "${DONE:-0}" -ge "$AFTER" ] && break
  sleep 1
done
VICTIM=$(own_executors | head -1)
if [ -n "${VICTIM:-}" ] && kill -0 $PID 2>/dev/null; then
  kill -PWR "$VICTIM"
  echo "[decom-check] SIGPWR -> executor JVM $VICTIM after $DONE queries done (graceful decommission)"
else
  echo "[decom-check] FAIL: no executor to decommission or run already over"
  exit 2
fi

wait $PID; RC=$?
echo "[decom-check] Verify exit=$RC"
if [ $RC -ne 0 ]; then
  echo "[decom-check] FAIL: Verify did not survive the decommission"
  tail -20 "$LOG"
  exit 1
fi
grep -q "failed:" "$LOG" && { echo "[decom-check] FAIL: per-query failure in log"; grep "failed:" "$LOG"; exit 1; }

# decommission + migration evidence: driver side sees the executor
# announce decommissioning; the executor side (standalone work dir)
# logs the BlockManagerDecommissioner's migrations. Both must appear —
# a PWR that silently no-ops would otherwise read as a pass.
DRIVER_EVIDENCE=$(grep -ci "decommission" "$LOG" || true)
WORK_LOGS=$(find "$SPARK_HOME/work" -newermt "@$T0" -name 'std*' 2>/dev/null)
# /dev/null keeps grep off stdin when find matched nothing (an empty
# operand list would block a terminal run forever instead of WARNing)
MIGRATED=$(grep -hi "migrat" $WORK_LOGS /dev/null 2>/dev/null | grep -ci "block" || true)
echo "[decom-check] driver decommission mentions: $DRIVER_EVIDENCE; executor block-migration lines: $MIGRATED"
if [ "${DRIVER_EVIDENCE:-0}" -eq 0 ]; then
  echo "[decom-check] FAIL: no decommission observed on the driver (signal lost?)"
  exit 1
fi
if [ "${MIGRATED:-0}" -eq 0 ]; then
  echo "[decom-check] WARN: no executor-side block-migration lines found (check $SPARK_HOME/work)"
fi

python3 tools/check.py "$SF" "$OUT"
CRC=$?
if [ $CRC -eq 0 ]; then
  echo "[decom-check] PASS: graceful decommission absorbed; all outputs oracle-exact"
fi
exit $CRC

#!/bin/bash
# Fault-tolerance validation: run a shuffle-heavy query subset under
# local-cluster mode and SIGKILL executor JVMs while the job runs.
# Spark must recover every time — task retry, lost-shuffle-block stage
# retry, and standalone executor re-provisioning — and the recovered
# results must still pass the exact same DuckDB-oracle compare.
#
# Usage: tools/run_chaos.sh [sfDir] [outDir]
#   KILLS=4 INTERVAL=6 tools/run_chaos.sh    # tune the chaos schedule
set -u
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/graft_chaos_out}
KILLS=${KILLS:-4}
INTERVAL=${INTERVAL:-6}
QUERIES=${QUERIES:-"q09_dedup_key q31_join_agg q33_minhash_pairs q45_dedup_clusters q47_percentile q59_salted_agg q74_grouping_sets q82_salted_join q84_ann_join q109_decontam"}
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
CLASSES="$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes"

DRIVER_LOG=$(mktemp /tmp/graft_chaos_driver.XXXXXX.log)
SPARK_HOME=${SPARK_HOME:-/opt/spark} \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER=${SPARK_GRAFT_MASTER:-local-cluster[2,8,4096]} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:$CLASSES" \
  graft.VerifySome "$SF" "$OUT" $QUERIES > >(tee "$DRIVER_LOG") 2>&1 &
DRIVER=$!

# Victim selection is scoped to DESCENDANTS of our driver JVM: a bare
# pgrep would match every executor on the host, and on a shared machine
# the chaos loop must never SIGKILL another job's executors.
descendants() {
  local pid=$1 c
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    echo "$c"
    descendants "$c"
  done
}
pick_victim() {
  local p
  for p in $(descendants "$1"); do
    if ps -o cmd= -p "$p" 2>/dev/null | grep -q CoarseGrainedExecutorBackend; then
      echo "$p"
    fi
  done | shuf -n1
}

# Killer loop: every $INTERVAL seconds, SIGKILL one live executor JVM
# (CoarseGrainedExecutorBackend — never the driver). The standalone
# master re-provisions a replacement on the surviving worker slot.
killed=0
while [ $killed -lt "$KILLS" ] && kill -0 $DRIVER 2>/dev/null; do
  sleep "$INTERVAL"
  # executors are forked children of this driver's in-process workers
  VICTIM=$(pick_victim $DRIVER || true)
  if [ -n "${VICTIM:-}" ]; then
    echo "[chaos] SIGKILL executor pid $VICTIM" >&2
    kill -9 "$VICTIM" 2>/dev/null && killed=$((killed+1))
  fi
done
echo "[chaos] killed $killed executors" >&2

wait $DRIVER
RC=$?
if [ $RC -ne 0 ]; then
  echo "[chaos] driver exited rc=$RC — a query failed outright" >&2
  exit $RC
fi
# The run is only a fault-tolerance test if chaos actually landed:
# require at least one executor-loss event in the driver log, else the
# kills all missed (e.g. fired between jobs) and the pass is vacuous.
LOSSES=$(grep -c "Lost executor" "$DRIVER_LOG" || true)
echo "[chaos] executor-loss events observed: $LOSSES" >&2
if [ "$LOSSES" -lt 1 ]; then
  echo "[chaos] FAIL: no executor loss observed — chaos never landed; rerun with a smaller INTERVAL" >&2
  exit 3
fi
python3 "$(dirname "$0")/check.py" "$SF" "$OUT"

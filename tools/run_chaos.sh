#!/bin/bash
# Fault-tolerance validation, three scenarios (PHASES="batch streaming commit"):
#
#  batch     — shuffle-heavy query subset under local-cluster mode with a
#              killer loop SIGKILLing executor JVMs mid-job. Spark must
#              recover (task retry, lost-shuffle-block stage retry,
#              standalone executor re-provisioning) and the recovered
#              results must pass the exact same DuckDB-oracle compare.
#  streaming — the stateful streaming subset (checkpointed restart q162,
#              windowed/session/dedup state, stream-stream joins) under
#              the same killer loop: executor death lands while streaming
#              state stores are live, so recovery replays micro-batches
#              from the checkpoint. Oracle compare must stay green.
#  commit    — a CommitLog writer is SIGKILLed BETWEEN claim and rename
#              (parked at the hold-after-claim failpoint, so the kill
#              point is exact, not probabilistic): a second writer must
#              bump past the markerless-claim tombstone, readers must
#              never see the torn slot, and GC must reap the corpse's
#              staging tree while keeping the tombstone. graft.storage
#              .ChaosCommit asserts the whole contract.
#
# Usage: tools/run_chaos.sh [sfDir] [outDir]
#   KILLS=4 INTERVAL=6 PHASES="batch streaming commit" tools/run_chaos.sh
set -u
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/graft_chaos_out}
KILLS=${KILLS:-4}
INTERVAL=${INTERVAL:-6}
PHASES=${PHASES:-"batch streaming commit"}
BATCH_QUERIES=${BATCH_QUERIES:-"q09_dedup_key q31_join_agg q33_minhash_pairs q45_dedup_clusters q47_percentile q59_salted_agg q74_grouping_sets q82_salted_join q84_ann_join q109_decontam q179_imi_join"}
STREAM_QUERIES=${STREAM_QUERIES:-"q162_stream_restart q61_stream_window q62_stream_sessions q63_stream_dedup q64_stream_state q83_stream_join q121_stream_tws q147_stream_left_join"}

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
CLASSES="$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes"
CHECKER="$(dirname "$0")/check.py"

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

# Run a VerifySome subset under local-cluster with the killer loop:
# every $INTERVAL seconds, SIGKILL one live executor JVM
# (CoarseGrainedExecutorBackend — never the driver). The standalone
# master re-provisions a replacement on the surviving worker slot.
# Pass criteria: driver rc 0, >=1 executor-loss event observed (else the
# kills all missed and the pass is vacuous), oracle compare green.
chaos_verify_phase() {
  local label=$1 out=$2; shift 2
  local queries="$*"
  rm -rf "$out"
  local driver_log
  driver_log=$(mktemp "/tmp/graft_chaos_${label}.XXXXXX.log")
  SPARK_HOME=${SPARK_HOME:-/opt/spark} \
  SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER=${SPARK_GRAFT_MASTER:-local-cluster[2,8,4096]} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$CLASSES" \
    graft.VerifySome "$SF" "$out" $queries > >(tee "$driver_log") 2>&1 &
  local driver=$!

  local killed=0 victim
  while [ $killed -lt "$KILLS" ] && kill -0 $driver 2>/dev/null; do
    sleep "$INTERVAL"
    victim=$(pick_victim $driver || true)
    if [ -n "${victim:-}" ]; then
      echo "[chaos/$label] SIGKILL executor pid $victim" >&2
      kill -9 "$victim" 2>/dev/null && killed=$((killed+1))
    fi
  done
  echo "[chaos/$label] killed $killed executors" >&2

  wait $driver
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[chaos/$label] driver exited rc=$rc — a query failed outright" >&2
    return $rc
  fi
  local losses
  losses=$(grep -c "Lost executor" "$driver_log" || true)
  echo "[chaos/$label] executor-loss events observed: $losses" >&2
  if [ "$losses" -lt 1 ]; then
    echo "[chaos/$label] FAIL: no executor loss observed — chaos never landed; rerun with a smaller INTERVAL" >&2
    return 3
  fi
  python3 "$CHECKER" "$SF" "$out"
}

# CommitLog writer killed between claim and rename. Three processes:
#  A commits v0; B parks at the failpoint holding the v1 claim and is
#  SIGKILLed there (kill-landing is asserted: sentinel present, marker
#  absent); C commits and must land on v2. ChaosCommit verify asserts
#  tombstone/gap/reader/GC invariants.
chaos_commit_phase() {
  local table sentinel
  table=$(mktemp -d /tmp/graft_chaos_commit.XXXXXX)
  sentinel="$table/_chaos_claimed"
  local jcmd=(env SPARK_GRAFT_MASTER="local[4]" java $ADD_OPENS -Xmx4g
    -Dspark.ui.enabled=false -cp "/opt/spark/jars/*:$CLASSES"
    graft.storage.ChaosCommit)

  "${jcmd[@]}" commit "$table" a > /tmp/graft_chaos_commit_a.log 2>&1 \
    || { echo "[chaos/commit] writer A failed" >&2; return 4; }

  GRAFT_CHAOS_HOLD_AFTER_CLAIM="$sentinel" "${jcmd[@]}" commit "$table" b \
    > /tmp/graft_chaos_commit_b.log 2>&1 &
  local bpid=$!
  local waited=0
  while [ ! -e "$sentinel" ] && [ $waited -lt 600 ]; do
    sleep 0.2; waited=$((waited+1))
    kill -0 $bpid 2>/dev/null || { echo "[chaos/commit] holder died before claiming" >&2; return 4; }
  done
  [ -e "$sentinel" ] || { echo "[chaos/commit] holder never reached the failpoint" >&2; kill -9 $bpid; return 4; }
  # asserted kill-landing: the claim exists, the marker does not — the
  # SIGKILL lands exactly between claim and rename
  [ -e "$table/_claims/1" ] || { echo "[chaos/commit] FAIL: no v1 claim at hold point" >&2; kill -9 $bpid; return 4; }
  [ ! -e "$table/_commits/1" ] || { echo "[chaos/commit] FAIL: v1 already published at hold point" >&2; kill -9 $bpid; return 4; }
  echo "[chaos/commit] SIGKILL writer pid $bpid holding claim v1 (pre-rename)" >&2
  kill -9 $bpid
  wait $bpid 2>/dev/null

  "${jcmd[@]}" commit "$table" c > /tmp/graft_chaos_commit_c.log 2>&1 \
    || { echo "[chaos/commit] post-kill writer C failed" >&2; return 4; }
  grep -q "committed v2 tag=c" /tmp/graft_chaos_commit_c.log \
    || { echo "[chaos/commit] FAIL: writer C did not land on v2: $(cat /tmp/graft_chaos_commit_c.log | tail -1)" >&2; return 4; }

  "${jcmd[@]}" verify "$table" 1 c 2>&1 | tail -3
  local rc=${PIPESTATUS[0]}
  [ $rc -eq 0 ] && rm -rf "$table"
  return $rc
}

overall=0
for phase in $PHASES; do
  echo "=== chaos phase: $phase ===" >&2
  case $phase in
    batch)     chaos_verify_phase batch "$OUT" $BATCH_QUERIES ;;
    streaming) chaos_verify_phase streaming "${OUT}_streaming" $STREAM_QUERIES ;;
    commit)    chaos_commit_phase ;;
    *) echo "unknown phase $phase" >&2; false ;;
  esac
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== chaos phase $phase FAILED rc=$rc ===" >&2
    overall=$rc
  else
    echo "=== chaos phase $phase OK ===" >&2
  fi
done
exit $overall

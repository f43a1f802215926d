#!/bin/bash
# Fault-tolerance validation (PHASES="batch streaming commit straddle"):
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
#   KILLS=4 INTERVAL=6 PHASES="batch streaming commit straddle" tools/run_chaos.sh
#
# straddle (DEFAULT since round 14 — the fit-sensitivity gate that caught
#   the retry-nondeterministic k-means sample is too valuable to be
#   opt-in) needs the sf-scaled pool at $IMI_DIR (/tmp/graft_sf20); when
#   the pool is absent the phase SKIPS with a loud banner rather than
#   failing, so default runs on a fresh box stay usable — but a skip
#   means the determinism contract went unexercised. Driver output goes
#   straight to the phase log file (no tee: the process-substitution tee
#   was async, and grepping the log right after `wait` raced its final
#   flush — ADVICE r13).
set -u
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/graft_chaos_out}
KILLS=${KILLS:-4}
INTERVAL=${INTERVAL:-6}
PHASES=${PHASES:-"batch streaming commit straddle"}
BATCH_QUERIES=${BATCH_QUERIES:-"q09_dedup_key q31_join_agg q33_minhash_pairs q45_dedup_clusters q47_percentile q59_salted_agg q74_grouping_sets q82_salted_join q84_ann_join q92_rank_family q109_decontam q157_cdc_apply q179_imi_join"}
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
# graft.rank.windowThreshold=0 forces q92's DISTRIBUTED rank form (range
# partition + pinned offsets): its round-20 volume dispatch would pick
# the plain window at chaos-sized data and leave the machinery this
# phase exists to kill-test unexercised.
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
    -Dgraft.rank.windowThreshold=0 \
    -cp "/opt/spark/jars/*:$CLASSES" \
    graft.VerifySome "$SF" "$out" $queries > "$driver_log" 2>&1 &
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

# Delegated-IMI join under executor SIGKILL (round-10 verdict item 5):
# q179 exercises verifyCellMates' lineage-safe materialization in the
# batch phase, but only at a scale where ivfNearDupJoin's auto path does
# NOT delegate (delegation fires past ~262k vectors). This phase runs
# the composite two-half-quantizer join on the sf20 pool (400k vectors,
# where the delegation branch is the one executing) under local-cluster
# with the killer loop, and requires the chaos result to equal a clean
# single-JVM reference count computed in the same invocation.
chaos_imi_phase() {
  local dir=${IMI_DIR:-/tmp/graft_sf20}
  if [ ! -d "$dir" ]; then
    echo "[chaos/imi] $dir missing — generate with: java ... graft.ScaleData /root/testdata/sf0.1 $dir 200" >&2
    return 5
  fi
  local clean_log=/tmp/graft_chaos_imi_clean.log
  # unset SPARK_GRAFT_MASTER to pin the clean reference to the in-process
  # master even when the caller exported a cluster master (round-12 ADVICE).
  # env -u, not `env SPARK_GRAFT_MASTER=`: an EMPTY value used to reach
  # SparkSession.builder().master("") and crash (GraftSession now also
  # treats empty as unset, belt and suspenders)
  env -u SPARK_GRAFT_MASTER \
    java $ADD_OPENS -Xmx16g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$CLASSES" graft.ScaleBench "$dir" chaos_clean imi_neardup \
    > "$clean_log" 2>&1 \
    || { echo "[chaos/imi] clean reference run failed" >&2; tail -3 "$clean_log" >&2; return 5; }
  local expect
  expect=$(grep -o '"rows":{[^}]*}' "$clean_log" | grep -o '"imi_neardup":[0-9]*' | cut -d: -f2)
  [ -n "$expect" ] || { echo "[chaos/imi] could not parse clean count" >&2; return 5; }
  echo "[chaos/imi] clean reference: $expect pairs" >&2

  local driver_log
  driver_log=$(mktemp /tmp/graft_chaos_imi.XXXXXX.log)
  # retry budgets sized for a preemption-routine cluster: the default
  # maxFailures=4 aborts when a task is retried onto executors that are
  # themselves mid-shutdown — with only 2 executors and a kill every
  # INTERVAL seconds, that is a churn ratio no real deployment sees
  # without also raising these (the failure mode is scheduler retry
  # placement, not engine state: no lineage/checkpoint loss involved).
  # Executors get 6g heaps inside 8192m workers (vs the verify phases'
  # 4g) — the 2g headroom absorbs off-heap/overhead: the 400k-vector join's
  # shuffle + persisted candidate blocks OOM a 4g heap outright (exit
  # 52), and OOM churn stacked on chaos kills trips the standalone
  # master's maxExecutorRetries, failing the app before the join can
  # demonstrate recovery.
  SPARK_HOME=${SPARK_HOME:-/opt/spark} \
  SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER=${IMI_MASTER:-local-cluster[2,8,8192]} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.task.maxFailures=8 -Dspark.stage.maxConsecutiveAttempts=8 \
    -Dspark.executor.memory=6g \
    -cp "/opt/spark/jars/*:$CLASSES" \
    graft.ScaleBench "$dir" chaos_imi imi_neardup > "$driver_log" 2>&1 &
  local driver=$!

  local killed=0 victim
  while [ $killed -lt "$KILLS" ] && kill -0 $driver 2>/dev/null; do
    sleep "$INTERVAL"
    victim=$(pick_victim $driver || true)
    if [ -n "${victim:-}" ]; then
      echo "[chaos/imi] SIGKILL executor pid $victim" >&2
      kill -9 "$victim" 2>/dev/null && killed=$((killed+1))
    fi
  done
  echo "[chaos/imi] killed $killed executors" >&2

  wait $driver
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[chaos/imi] driver exited rc=$rc — the delegated join failed outright" >&2
    return $rc
  fi
  local losses
  losses=$(grep -c "Lost executor" "$driver_log" || true)
  echo "[chaos/imi] executor-loss events observed: $losses" >&2
  if [ "$losses" -lt 1 ]; then
    echo "[chaos/imi] FAIL: no executor loss observed — chaos never landed; rerun with a smaller INTERVAL" >&2
    return 3
  fi
  local got
  got=$(grep -o '"rows":{[^}]*}' "$driver_log" | grep -o '"imi_neardup":[0-9]*' | cut -d: -f2)
  if [ -z "$got" ]; then
    echo "[chaos/imi] FAIL: could not parse the chaos-run count from $driver_log (rc was 0) — parse failure, NOT a divergence" >&2
    tail -5 "$driver_log" >&2
    return 7
  fi
  if [ "$got" != "$expect" ]; then
    echo "[chaos/imi] FAIL: chaos count $got != clean count $expect" >&2
    return 6
  fi
  echo "[chaos/imi] OK: chaos count $got == clean count under $losses executor losses" >&2
}

# Fit-SENSITIVE chaos equality (round 13): the imi phase's count
# equality is blind to quantizer-fit divergence — its artifact-free
# pool has zero natural pairs (0 == 0 always), and the old pool's
# exact-dup twins collide in ANY geometry. This phase runs the planted
# STRADDLE workload, whose recall moves with the fit, plus a direct
# fingerprint of the fitted centers, and requires both to be
# BIT-EQUAL between an in-process clean run and a local-cluster run
# under the killer loop. This is the gate that would have caught the
# retry-nondeterministic training sample (SCALE.md: sample(frac)
# .limit(k) kept arrival-order rows; fixed by the content-addressed
# sampleVectors) — and it now pins that determinism contract: the
# in-process vs cluster comparison only holds BECAUSE the sample is
# content-addressed (master/layout-independent).
chaos_straddle_phase() {
  local dir=${IMI_DIR:-/tmp/graft_sf20}
  if [ ! -d "$dir" ]; then
    echo "" >&2
    echo "[chaos/straddle] ######################################################################" >&2
    echo "[chaos/straddle] ## SKIPPED: sf-scaled pool $dir is ABSENT." >&2
    echo "[chaos/straddle] ## The fit-determinism contract was NOT exercised on this run." >&2
    echo "[chaos/straddle] ## Generate it (then re-run):" >&2
    echo "[chaos/straddle] ##   java -cp /opt/spark/jars/*:target/scala-2.13/classes \\" >&2
    echo "[chaos/straddle] ##     graft.ScaleData /root/testdata/sf0.1 $dir 200 embeddings" >&2
    echo "[chaos/straddle] ######################################################################" >&2
    echo "" >&2
    return 99
  fi
  local clean_log=/tmp/graft_chaos_straddle_clean.log
  env -u SPARK_GRAFT_MASTER \
    java $ADD_OPENS -Xmx16g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$CLASSES" graft.ScaleBench "$dir" chaos_straddle_clean \
    imi_fit_hash straddle_recall_imi > "$clean_log" 2>&1 \
    || { echo "[chaos/straddle] clean reference run failed" >&2; tail -3 "$clean_log" >&2; return 5; }
  local expect_fit expect_found
  expect_fit=$(grep -o '"rows":{[^}]*}' "$clean_log" | grep -o '"imi_fit_hash":[0-9]*' | cut -d: -f2)
  expect_found=$(grep -o '"rows":{[^}]*}' "$clean_log" | grep -o '"straddle_recall_imi":[0-9]*' | cut -d: -f2)
  [ -n "$expect_fit" ] && [ -n "$expect_found" ] \
    || { echo "[chaos/straddle] could not parse clean reference" >&2; return 5; }
  if [ "$expect_found" -eq 0 ]; then
    echo "[chaos/straddle] FAIL: clean straddle count is 0 — the workload is not fit-sensitive on this pool" >&2
    return 5
  fi
  echo "[chaos/straddle] clean reference: fit $expect_fit, found $expect_found" >&2

  local driver_log
  driver_log=$(mktemp /tmp/graft_chaos_straddle.XXXXXX.log)
  SPARK_HOME=${SPARK_HOME:-/opt/spark} \
  SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER=${IMI_MASTER:-local-cluster[2,8,8192]} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.task.maxFailures=8 -Dspark.stage.maxConsecutiveAttempts=8 \
    -Dspark.executor.memory=6g \
    -cp "/opt/spark/jars/*:$CLASSES" \
    graft.ScaleBench "$dir" chaos_straddle imi_fit_hash straddle_recall_imi \
    > "$driver_log" 2>&1 &
  local driver=$!

  local killed=0 victim
  while [ $killed -lt "$KILLS" ] && kill -0 $driver 2>/dev/null; do
    sleep "$INTERVAL"
    victim=$(pick_victim $driver || true)
    if [ -n "${victim:-}" ]; then
      echo "[chaos/straddle] SIGKILL executor pid $victim" >&2
      kill -9 "$victim" 2>/dev/null && killed=$((killed+1))
    fi
  done
  echo "[chaos/straddle] killed $killed executors" >&2

  wait $driver
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[chaos/straddle] driver exited rc=$rc — the workload failed outright" >&2
    return $rc
  fi
  local losses
  losses=$(grep -c "Lost executor" "$driver_log" || true)
  echo "[chaos/straddle] executor-loss events observed: $losses" >&2
  if [ "$losses" -lt 1 ]; then
    echo "[chaos/straddle] FAIL: no executor loss observed — chaos never landed; rerun with a smaller INTERVAL" >&2
    return 3
  fi
  local got_fit got_found
  got_fit=$(grep -o '"rows":{[^}]*}' "$driver_log" | grep -o '"imi_fit_hash":[0-9]*' | cut -d: -f2)
  got_found=$(grep -o '"rows":{[^}]*}' "$driver_log" | grep -o '"straddle_recall_imi":[0-9]*' | cut -d: -f2)
  if [ -z "$got_fit" ] || [ -z "$got_found" ]; then
    echo "[chaos/straddle] FAIL: could not parse fit/count from $driver_log (rc was 0) — parse failure, NOT a divergence" >&2
    tail -5 "$driver_log" >&2
    return 7
  fi
  if [ "$got_fit" != "$expect_fit" ]; then
    echo "[chaos/straddle] FAIL: chaos fit fingerprint $got_fit != clean $expect_fit — the training sample diverged under recovery" >&2
    return 6
  fi
  if [ "$got_found" != "$expect_found" ]; then
    echo "[chaos/straddle] FAIL: chaos count $got_found != clean count $expect_found (fit identical — divergence is in the join/verify recovery path)" >&2
    return 6
  fi
  echo "[chaos/straddle] OK: fit $got_fit and count $got_found bit-equal to clean under $losses executor losses" >&2
}

# Pointer-doubling connectedComponents under executor SIGKILL (round-11
# verdict item 4): the CC loop is stateful across rounds and mixes cache
# pinning, unpersist of the previous round, and per-round plan
# truncation to a LogicalRDD — the machinery class where the r9 chaos
# harness found the q84 lineage bug. The cc_chain workload is
# CC-DOMINATED by construction (64 interleaved chain components,
# diameter n/64 — the worst case doubling exists for), so the killer
# loop lands executor deaths inside mid-round label-propagation jobs
# with live caches. The result is a checksum over every node's final
# label (Σ labels; exact value (n/64)·Σr), compared against a clean
# single-JVM reference computed in the same invocation — any node
# mislabeled during recovery shifts it.
chaos_cc_phase() {
  local nodes=${CC_NODES:-2000000}
  local clean_log=/tmp/graft_chaos_cc_clean.log
  # unset SPARK_GRAFT_MASTER (see chaos_imi_phase — env -u, not an
  # empty value) to pin the clean reference to the in-process master
  env -u SPARK_GRAFT_MASTER GRAFT_SCALE_CC_NODES=$nodes \
    java $ADD_OPENS -Xmx16g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$CLASSES" graft.ScaleBench "$SF" chaos_cc_clean cc_chain \
    > "$clean_log" 2>&1 \
    || { echo "[chaos/cc] clean reference run failed" >&2; tail -3 "$clean_log" >&2; return 5; }
  local expect
  expect=$(grep -o '"rows":{[^}]*}' "$clean_log" | grep -o '"cc_chain":[0-9]*' | cut -d: -f2)
  [ -n "$expect" ] || { echo "[chaos/cc] could not parse clean checksum" >&2; return 5; }
  echo "[chaos/cc] clean reference checksum: $expect" >&2

  local driver_log
  driver_log=$(mktemp /tmp/graft_chaos_cc.XXXXXX.log)
  # same retry-budget rationale as the imi phase: 2 executors with a
  # kill every INTERVAL seconds is churn no real deployment sees
  # without also raising maxFailures
  GRAFT_SCALE_CC_NODES=$nodes \
  SPARK_HOME=${SPARK_HOME:-/opt/spark} \
  SPARK_SCALA_VERSION=2.13 \
  SPARK_GRAFT_MASTER=${CC_MASTER:-local-cluster[2,8,6144]} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.task.maxFailures=8 -Dspark.stage.maxConsecutiveAttempts=8 \
    -Dspark.executor.memory=4g \
    -cp "/opt/spark/jars/*:$CLASSES" \
    graft.ScaleBench "$SF" chaos_cc cc_chain > "$driver_log" 2>&1 &
  local driver=$!

  local killed=0 victim
  while [ $killed -lt "$KILLS" ] && kill -0 $driver 2>/dev/null; do
    sleep "$INTERVAL"
    victim=$(pick_victim $driver || true)
    if [ -n "${victim:-}" ]; then
      echo "[chaos/cc] SIGKILL executor pid $victim" >&2
      kill -9 "$victim" 2>/dev/null && killed=$((killed+1))
    fi
  done
  echo "[chaos/cc] killed $killed executors" >&2

  wait $driver
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "[chaos/cc] driver exited rc=$rc — the CC run failed outright" >&2
    return $rc
  fi
  local losses
  losses=$(grep -c "Lost executor" "$driver_log" || true)
  echo "[chaos/cc] executor-loss events observed: $losses" >&2
  if [ "$losses" -lt 1 ]; then
    echo "[chaos/cc] FAIL: no executor loss observed — chaos never landed; rerun with a smaller INTERVAL" >&2
    return 3
  fi
  local got
  got=$(grep -o '"rows":{[^}]*}' "$driver_log" | grep -o '"cc_chain":[0-9]*' | cut -d: -f2)
  if [ -z "$got" ]; then
    echo "[chaos/cc] FAIL: could not parse the chaos-run checksum from $driver_log (rc was 0) — parse failure, NOT a divergence" >&2
    tail -5 "$driver_log" >&2
    return 7
  fi
  if [ "$got" != "$expect" ]; then
    echo "[chaos/cc] FAIL: chaos checksum $got != clean checksum $expect" >&2
    return 6
  fi
  echo "[chaos/cc] OK: chaos checksum $got == clean checksum under $losses executor losses" >&2
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
    imi)       chaos_imi_phase ;;
    straddle)  chaos_straddle_phase ;;
    cc)        chaos_cc_phase ;;
    *) echo "unknown phase $phase" >&2; false ;;
  esac
  rc=$?
  if [ $rc -eq 99 ]; then
    echo "=== chaos phase $phase SKIPPED (prerequisite absent — see banner above) ===" >&2
  elif [ $rc -ne 0 ]; then
    echo "=== chaos phase $phase FAILED rc=$rc ===" >&2
    overall=$rc
  else
    echo "=== chaos phase $phase OK ===" >&2
  fi
done
exit $overall

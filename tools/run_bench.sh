#!/bin/bash
# Drive graft.Bench. The canonical BENCH_full.json artifact (the judge
# reads it; VERDICT quotes it as the sf0.1 record) is only written for
# sf0.1 runs — smaller-sf iteration runs write /tmp/BENCH_<sf>.json so a
# quick local check can never clobber the headline record with
# mislabeled numbers (this exact clobber shipped round 8's artifact
# stamped sf0.001).
SF=${1:-/root/testdata/sf0.001}
case "$SF" in
  */sf0.1|*/sf0.1/) OUT=${SPARK_GRAFT_BENCH_OUT:-BENCH_full.json} ;;
  *)                OUT=${SPARK_GRAFT_BENCH_OUT:-/tmp/BENCH_$(basename "$SF").json} ;;
esac
# Quiet-box tripwire (the BENCH_r12 lesson: a record taken right after
# heavy ScaleBench/chaos work read +18% with no code cause). Concurrent
# load and low free disk are the two contamination signatures we have
# actually observed — warn loudly, don't block, so an intentional
# loaded-box run is still possible but never silent.
# default to 0 when /proc/loadavg is unreadable/empty — the bare test
# would otherwise abort with "integer expression expected" (ADVICE r13)
LOAD=$(cut -d' ' -f1 /proc/loadavg 2>/dev/null || echo 0)
LOAD=${LOAD:-0}
# check SPARK's shuffle disk (local dir), not the repo filesystem — the
# observed contamination mechanism is shuffle-spill exhaustion on /tmp
SHUFFLE_DIR=${SPARK_LOCAL_DIRS%%,*}; SHUFFLE_DIR=${SHUFFLE_DIR:-/tmp}
AVAIL_G=$(df --output=avail -BG "$SHUFFLE_DIR" 2>/dev/null | tail -1 | tr -dc '0-9')
if [ "${LOAD%%.*}" -ge 4 ] || { [ -n "$AVAIL_G" ] && [ "$AVAIL_G" -lt 20 ]; }; then
  echo "[bench] WARNING: box not quiet (loadavg=$LOAD, free disk=${AVAIL_G:-?}G)" >&2
  echo "[bench] WARNING: treat this record as contaminated; re-run quiet before recording" >&2
fi
# Hypervisor-steal tripwire (r16 finding #2: loadavg is blind to steal —
# the r16c sf10 record carried ~410 CPU-s of bursty co-tenant steal, with
# loadavg green throughout). Sample /proc/stat's cpu steal field over 3 s;
# any sustained rate above ~0.05 CPU-s/s at the start of a run is the
# fingerprint of a noisy co-tenant. Bursty steal can still start later —
# the in-record steal_sec (graft.Bench) is the authoritative post-hoc
# check; this gate catches the already-noisy case before 25+ min is spent.
STEAL0=$(awk '/^cpu /{print $9}' /proc/stat 2>/dev/null)
if [ -n "$STEAL0" ]; then
  sleep 3
  STEAL1=$(awk '/^cpu /{print $9}' /proc/stat 2>/dev/null)
  # jiffies (USER_HZ=100) over 3 s → threshold 15 jiffies = 0.05 CPU-s/s
  if [ -n "$STEAL1" ] && [ $((STEAL1 - STEAL0)) -ge 15 ]; then
    echo "[bench] WARNING: hypervisor steal active ($(((STEAL1 - STEAL0))) jiffies in 3 s, ~$(((STEAL1 - STEAL0) / 3))% of one CPU)" >&2
    echo "[bench] WARNING: co-tenant noise fingerprint — do NOT record; re-run when steal_sec reads quiet" >&2
  fi
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# BENCH_XMX: heap override for exploratory big-SF runs. The graded sf0.1
# record stays at the 8g default (comparability across rounds); at sf10
# the 179-query single-JVM run is MARGINAL at 8g — streaming state for 32
# partitions lives in one heap that a real cluster would spread across
# executors, and an OOM mid-pass poisons every later query (observed:
# q62 OOM'd the context and q62-q99 all read -1).
BENCH_XMX=${BENCH_XMX:-8g}
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$OUT" SPARK_GRAFT_CPUS=${2:-8} java $ADD_OPENS -Xmx$BENCH_XMX \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" graft.Bench

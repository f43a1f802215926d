#!/bin/bash
# Opportunistic quiet-window bench hunter (round 19). The co-tenant's
# steal bursts make clean records a timing game: sample steal over a
# 20 s pre-gate and launch the bench ONLY when the box reads quiet
# (< 0.75 jiffies/s = 0.0075 CPU-s/s at 100 Hz — SCALE.md's fingerprint
# threshold), else sleep and retry. Each launched record still self-stamps its contamination
# verdict (graft.Bench) — a burst that starts mid-run is caught by the
# stamp, and the hunter keeps going until a record lands with ct:0 or
# attempts run out. Never runs concurrently with another JVM (that
# would contaminate the record with SELF-load the steal stamp cannot
# see — the r12/r15 lesson in SCALE.md).
#
# Usage: tools/hunt_quiet_bench.sh <sfDir> <outPrefix> [maxAttempts] [cpus]
#   tools/hunt_quiet_bench.sh /root/testdata/sf0.1 /tmp/BENCH_sf01_r19 6
# cpus defaults to run_bench.sh's 8 (the committed BENCH_sf01_* series
# protocol); pass 32 to hunt a record in the driver's graded
# configuration (BENCH_rNN runs at SPARK_GRAFT_CPUS=32).
set -u
SF=${1:?sfDir}
PREFIX=${2:?output prefix}
MAX=${3:-6}
CPUS=${4:-8}
GATE_JIFFIES=${GATE_JIFFIES:-15}   # per 20 s window = 0.75 j/s = 0.0075 CPU-s/s
attempt=0
while [ "$attempt" -lt "$MAX" ]; do
  if [ "$(ps aux | grep -c '[j]ava')" -gt 0 ]; then
    echo "[hunt] another JVM is running — refusing to launch (self-load contaminates silently)"; exit 2
  fi
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 20
  s1=$(awk '/^cpu /{print $9}' /proc/stat); d=$((s1 - s0))
  if [ "$d" -ge "$GATE_JIFFIES" ]; then
    echo "[hunt] $(date +%H:%M:%S) busy (${d}j/20s >= ${GATE_JIFFIES}) — sleeping 90s"
    sleep 90
    continue
  fi
  attempt=$((attempt + 1))
  out="${PREFIX}_a${attempt}.json"
  echo "[hunt] $(date +%H:%M:%S) quiet (${d}j/20s) — attempt $attempt -> $out"
  SPARK_GRAFT_BENCH_OUT="$out" tools/run_bench.sh "$SF" "$CPUS" \
    > "${PREFIX}_a${attempt}.out" 2> "${PREFIX}_a${attempt}.err"
  rc=$?
  # a crashed run leaves no/partial JSON; without the rc/ERR distinction
  # the log read "stamped ct:" with a blank value — indistinguishable
  # from a contaminated record (ADVICE r19)
  if [ "$rc" -ne 0 ]; then
    echo "[hunt] attempt $attempt: bench run FAILED (exit $rc) — see ${PREFIX}_a${attempt}.err"
    continue
  fi
  ct=$(python3 -c "import json;print(1 if json.load(open('$out'))['calib']['contaminated'] else 0)" 2>/dev/null)
  ct=${ct:-ERR}
  if [ "$ct" = "0" ]; then
    echo "[hunt] CLEAN record landed: $out"; exit 0
  elif [ "$ct" = "ERR" ]; then
    echo "[hunt] attempt $attempt: record unreadable (run exited 0 but $out is missing/partial)"
  else
    echo "[hunt] attempt $attempt stamped ct:$ct — continuing"
  fi
done
echo "[hunt] no clean record in $MAX attempts"; exit 1

#!/usr/bin/env bash
# Strong-scaling (core-count) sweep: fixed data, vary local[N], fresh JVM
# per point, TimeQuery's warm-floor protocol (iters=4; analyze min of
# iters 2..4 so per-plan first-compile is excluded and each point is a
# steady-state number). shuffle.partitions tracks the core count inside
# TimeQuery, which is what a real cluster sizing would do when executors
# scale.
#
# Usage:
#   tools/run_scaling.sh <sfDir> <out.jsonl> [query ...]
#   CORES="4 8 16 32" ITERS=4 tools/run_scaling.sh /root/testdata/sf0.1 /tmp/scaling_sf0.1.jsonl q77_map_functions
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:?sfDir}
OUT=${2:?out.jsonl}
shift 2
QUERIES=${*:-"q77_map_functions q163_map_hof q122_try_functions q50_json_extract q09_dedup_key q33_minhash_pairs"}
CORES=${CORES:-"4 8 16 32"}
ITERS=${ITERS:-4}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
: > "$OUT"
for c in $CORES; do
  echo "[scaling] sf=$SF cores=$c" >&2
  # env: an expansion-produced VAR=val word is not an assignment prefix
  line=$(env SPARK_GRAFT_CPUS=$c ${SHUFFLE:+SPARK_GRAFT_SHUFFLE=$SHUFFLE} java $ADD_OPENS -Xmx16g \
    -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
    graft.TimeQuery "$SF" "$ITERS" $QUERIES | tail -1)
  echo "{\"sf\":\"$SF\",\"cores\":$c,\"shuffle\":${SHUFFLE:-$c},${line#\{}" >> "$OUT"
done
echo "[scaling] wrote $OUT" >&2

#!/bin/bash
# Per-round width-audit gate (round-17, verdict r16 item 4): sweep all
# registered queries for unguarded costly scan-side work below the
# parallelism floor (graft.WidthAudit) and commit the result as
# WIDTH_AUDIT.txt. The narrow-layout hazard produced NINE 2-5x sightings
# across rounds 14-16, found one bench-tail hunt at a time until the
# audit swept the last four in one command — committing the sweep per
# round turns a regression (a new NARROW line) into a visible git diff
# instead of a future hunt. Current residual NARROW list = by-design
# bounded inputs only (fixture decodes, the 6-url fetch).
#
# Usage: tools/run_width_audit.sh [sfDir] [outFile]
#   sfDir   default /root/testdata/sf0.001 (plan shapes, not timings)
#   outFile default WIDTH_AUDIT.txt (repo root — commit it)
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-WIDTH_AUDIT.txt}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx8g -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  graft.WidthAudit "$SF" 2>/dev/null \
  | grep -E '^(FLAG|SKIP|===)' > "$OUT.tmp"
mv "$OUT.tmp" "$OUT"
echo "[width-audit] wrote $OUT"
grep '^===' "$OUT"
# a diff against the committed baseline is the gate: new NARROW names
# mean a kernel lost its guard (or a new query shipped unguarded)
if ! git ls-files --error-unmatch "$OUT" >/dev/null 2>&1; then
  echo "[width-audit] $OUT is not committed yet — commit it as the baseline"
elif git diff --quiet -- "$OUT" 2>/dev/null; then
  echo "[width-audit] no change vs committed baseline"
else
  echo "[width-audit] DIFFERS from committed baseline — review before committing:"
  git diff --stat -- "$OUT" 2>/dev/null
fi

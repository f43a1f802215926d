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
# -e/-o pipefail + explicit exit check (ADVICE r17): a failed java
# invocation (bad classpath, missing sfDir) used to yield an EMPTY grep
# result that silently overwrote the committed baseline — a failed audit
# must abort loudly, leaving WIDTH_AUDIT.txt untouched.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-WIDTH_AUDIT.txt}
# WidthAudit tolerates per-query errors as SKIP lines, so a missing data
# dir would "succeed" into an all-SKIP file that overwrites the baseline
if [ ! -d "$SF" ]; then
  echo "[width-audit] FAILED: sfDir $SF does not exist — $OUT left untouched" >&2
  exit 1
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# java's stderr (Spark log noise) is captured to a scratch file and
# shown only when the audit fails, so a failure is diagnosable; zero
# FLAG/===/SKIP lines also aborts (that only happens when the audit main
# is broken).
if ! java $ADD_OPENS -Xmx8g -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
    graft.WidthAudit "$SF" > "$OUT.raw" 2> "$OUT.err"; then
  echo "[width-audit] FAILED: graft.WidthAudit exited non-zero — $OUT left untouched; stderr tail:" >&2
  tail -20 "$OUT.err" >&2
  rm -f "$OUT.raw" "$OUT.err"
  exit 1
fi
rm -f "$OUT.err"
grep -E '^(FLAG|SKIP|===)' "$OUT.raw" > "$OUT.tmp" || true
rm -f "$OUT.raw"
if [ ! -s "$OUT.tmp" ]; then
  rm -f "$OUT.tmp"
  echo "[width-audit] FAILED: audit produced zero FLAG/===/SKIP lines — $OUT left untouched" >&2
  exit 1
fi
mv "$OUT.tmp" "$OUT"
echo "[width-audit] wrote $OUT"
grep '^===' "$OUT" || true
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

#!/bin/bash
# I/O-separated zorder_write scaling methodology (round-8 verdict item 1).
#
# zorder_write's raw 100x wall-clock was noisy and nominally super-linear
# (130.1 s = 38.8x, 89.3 s on a repeat) with the excess ATTRIBUTED to disk
# I/O variance but never measured. This script measures it: for each scale
# point it runs, in fresh JVMs,
#   disk    - zorder_write to /tmp            (the headline number)
#   tmpfs   - zorder_write to /dev/shm        (device I/O removed, parquet
#                                              encode + full plan kept)
#   compute - zorder_compute via a noop sink  (scan -> Morton -> range
#                                              shuffle -> sort only)
# each REPEATS times, and reports the per-cell MIN (a noisy reading can
# only be corrected downward) plus bytes written, so the disk rows also
# normalize as MB/s. The claim under test: the COMPUTE ratio per 10x of
# data stays inside the <=12x near-linear bar; any excess in the disk rows
# beyond tmpfs is device I/O, not plan growth.
#
# Usage: tools/run_zorder_scale.sh
#   REPEATS=3 POINTS="/root/testdata/sf0.1 /tmp/graft_sf1 /tmp/graft_sf10"
set -eu
REPEATS=${REPEATS:-3}
POINTS=${POINTS:-"/root/testdata/sf0.1 /tmp/graft_sf1 /tmp/graft_sf10"}
CLASSES="$(cd "$(dirname "$0")/.." && pwd)/target/scala-2.13/classes"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

one_run() { # dir workload outpath -> "seconds bytes"
  local dir=$1 wl=$2 out=$3
  GRAFT_SCALE_WARMUP=1 GRAFT_SCALE_ZORDER_OUT="$out" java $ADD_OPENS -Xmx16g \
    -Dspark.ui.enabled=false \
    -cp "/opt/spark/jars/*:$CLASSES" graft.ScaleBench "$dir" "$dir" "$wl" \
    2>/dev/null | python3 -c "
import json,sys
d=json.loads(sys.stdin.readline())
print(d['times']['$wl'], d['rows']['$wl'])"
}

echo "point mode min_sec runs_sec bytes"
for dir in $POINTS; do
  for mode in disk tmpfs compute; do
    case $mode in
      disk)    wl=zorder_write;   out=/tmp/graft_scale_zorder ;;
      tmpfs)   wl=zorder_write;   out=/dev/shm/graft_scale_zorder ;;
      compute) wl=zorder_compute; out=/tmp/graft_scale_zorder_unused ;;
    esac
    times=(); bytes=0
    for _ in $(seq "$REPEATS"); do
      read -r t b < <(one_run "$dir" "$wl" "$out")
      times+=("$t"); bytes=$b
      rm -rf /dev/shm/graft_scale_zorder
    done
    min=$(printf '%s\n' "${times[@]}" | sort -g | head -1)
    echo "$dir $mode $min [${times[*]}] $bytes"
  done
done

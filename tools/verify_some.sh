#!/bin/bash
# Verify + check a subset of queries: tools/verify_some.sh q129_zorder_layout ...
SF=${SF:-/root/testdata/sf0.01}
OUT=${OUT:-/tmp/graft_verify_some}
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  graft.VerifySome "$SF" "$OUT" "$@" && \
python3 tools/check.py "$SF" "$OUT"

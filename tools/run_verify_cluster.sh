#!/bin/bash
# Run graft.Verify under local-cluster mode: separate executor JVMs, so
# closure/shuffle/broadcast serialization is real. Same dump + check.py
# contract as run_verify.sh.
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_verify_cluster_out}
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# the in-process worker builds executor commands without sourcing
# bin/load-spark-env.sh, so the scala version must be in the env
SPARK_HOME=${SPARK_HOME:-/opt/spark} \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER=${SPARK_GRAFT_MASTER:-local-cluster[2,8,4096]} \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/opt/spark/jars/*:$(pwd)/target/scala-2.13/classes" \
  graft.Verify "$SF" "$OUT"

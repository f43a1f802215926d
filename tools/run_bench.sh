#!/bin/bash
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR=${1:-/root/testdata/sf0.001} SPARK_GRAFT_CPUS=${2:-8} java $ADD_OPENS -Xmx8g \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" graft.Bench

#!/bin/bash
# Direct launcher for graft mains, bypassing the sbt project lock:
# tools/run.sh <mainClass> [args...]  (heap via SPARK_DRIVER_MEM, default 8g)
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
# Full org.apache.spark.launcher.JavaModuleOptions list (what
# spark-submit injects). jdk.internal.ref and java.nio are NOT
# optional: KryoSerializer.newKryo registers HeapByteBuffer, so the
# first shuffle whose serializer auto-resolves to Kryo (any RDD of
# primitive arrays, e.g. the Bloom bitset treeAggregate) dies with
# "Unable to create serializer ... HeapByteBuffer" without them.
# Bench/Verify also run graft.util.LauncherCheck.assertModuleOpens()
# at startup — a launch path missing these opens now fails in second
# one with a named remedy instead of at sf10 hour one.
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         jdk.internal.ref; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"

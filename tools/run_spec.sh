#!/bin/bash
# Run ScalaTest suites directly (bypassing sbt, whose logger output is
# invisible in some non-tty harnesses — rc stays reliable but failure
# detail doesn't). Usage:
#   tools/run_spec.sh graft.FunctionsSpec [graft.OtherSpec ...]
# Compile first (sbt -batch Test/compile); this only RUNS classes.
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
TEST_JARS=$(find ~/.cache/coursier -name "scalatest*_2.13-3.2.19.jar" \
  -o -name "scalatest-compatible-3.2.19.jar" \
  -o -name "scalactic_2.13-3.2.19.jar" \
  -o -name "scalacheck_2.13-1.18.0.jar" \
  -o -name "test-interface-1.0.jar" 2>/dev/null | paste -sd:)
SUITES=""
for s in "$@"; do SUITES="$SUITES -s $s"; done
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-31g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dlog4j2.configurationFile=/root/repo/conf/log4j2.properties \
  -cp "/root/repo/target/scala-2.13/test-classes:/root/repo/target/scala-2.13/classes:$TEST_JARS:/opt/spark/jars/*" \
  org.scalatest.tools.Runner -R /root/repo/target/scala-2.13/test-classes -oW $SUITES

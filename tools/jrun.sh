#!/bin/bash
# Direct JVM runner for graft mains — bypasses sbt (and its project
# lock) using the already-compiled classes. Usage:
#   tools/jrun.sh graft.Verify <sfDir> <outDir> [only]
#   SPARK_DRIVER_MEM=48g tools/jrun.sh graft.Bench
# NOTE: does NOT compile; run `sbt compile` first.
cd "$(dirname "$0")/.." || exit 1
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCALA_JARS=$(ls "$HOME"/.sbt/boot/scala-2.13.*/lib/scala-library.jar 2>/dev/null | head -1)
if [ -z "$SCALA_JARS" ]; then
  SCALA_JARS=$(find "$HOME/.cache/coursier" -name 'scala-library-2.13*.jar' 2>/dev/null | head -1)
fi
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:$SCALA_JARS:/opt/spark/jars/*" "$@"

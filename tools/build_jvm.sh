#!/bin/sh
# Compile the JVM block packer against the pyspark-bundled Scala
# compiler + Spark jars and drop riotspark.jar next to the source.
# No network, no build tool — just the scalac that ships inside the
# pyspark wheel (Spark 4.x bundles scala-compiler for its REPL).
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JARS="$(python -c 'import os, pyspark; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
CP="$(ls "$JARS"/*.jar | tr '\n' ':')"
OUT="$REPO/riot_spark/jvm"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT
"${JAVA_HOME:-/usr}/bin/java" -cp "$CP" scala.tools.nsc.Main \
  -classpath "$CP" -opt:inline:riotspark.** -d "$TMP" \
  "$OUT"/*.scala
"${JAVA_HOME:-/usr}/bin/jar" cf "$OUT/riotspark.jar" -C "$TMP" .
echo "built $OUT/riotspark.jar"

#!/bin/sh
# Build the optional JVM fast-path jar.  Requires JDK 17 and a Spark
# distribution (SPARK_HOME, default /opt/spark) for the compile classpath.
# The jar is committed at hllspark/jars/hllspark-jvm.jar so runtime users
# never need javac; re-run this after editing java/src.
set -e
cd "$(dirname "$0")"
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
rm -rf build && mkdir -p build
javac --release 17 -encoding UTF-8 -cp "$SPARK_JARS/*" -d build $(find src -name '*.java')
jar cf ../hllspark/jars/hllspark-jvm.jar -C build .
echo "built ../hllspark/jars/hllspark-jvm.jar"

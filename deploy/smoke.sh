#!/bin/bash
# End-to-end smoke of the container entrypoint contract WITHOUT a Docker
# daemon (the build sandbox has none): package the jar, then run exactly
# the command the image's entrypoint would run — the Floorista main under
# a Spark runtime classpath — against local-FS testdata, and assert the
# partitioned parquet dump landed. This is the FlooristaSpec floorplan
# driven through the packaged artifact instead of ScalaTest.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/flooristspark_2.13-*.jar | head -1)

OUT=$(mktemp -d /tmp/graft_smoke.XXXX)
FP=$OUT/floorplan.yaml
cat > "$FP" <<'YAML'
- prefix: dumps/nations
  query: SELECT n_nationkey, n_name FROM nation
- prefix: dumps/series
  query: SELECT GENERATE_SERIES(0,99)
  chunksize: 40
YAML

# The entrypoint runs spark-submit; outside the image the equivalent is
# java with the Spark jars on the classpath and the JDK17 module opens
# (what spark-submit injects). Same class, same env contract.
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

mkdir -p "$OUT/bucket"   # the bucket must pre-exist (no-such-bucket aborts, by contract)
AWS_BUCKET="file://$OUT/bucket" \
FLOORPLAN_FILE="$FP" \
GRAFT_TABLE_DIR="/root/testdata/sf0.001" \
GRAFT_FILE_CONTRACT=exact \
LOGLEVEL=warning \
java $ADD_OPENS -Dspark.ui.enabled=false \
  -cp "$JAR:/opt/spark/jars/*" graft.core.Floorista

echo "--- dumped files:"
find "$OUT/bucket" -name '*.parquet' | sort
N=$(find "$OUT/bucket" -name '*.parquet' | wc -l)
# nations = 1 chunk file; series = 100 rows / chunksize 40 = 3 files
[ "$N" -ge 4 ] || { echo "SMOKE FAIL: expected >=4 parquet files, got $N"; exit 1; }
find "$OUT/bucket" -path '*year_created=*' -name '*.parquet' >/dev/null || { echo "SMOKE FAIL: no dated partition layout"; exit 1; }
echo "SMOKE OK ($N parquet files under dated partitions)"

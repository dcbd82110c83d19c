#!/bin/sh
# Container entrypoint: run the floorist surface under spark-submit.
# Config comes entirely from env vars (the reference contract,
# src/floorist/config.py:25-105 → core/EngineConfig.scala): FLOORPLAN_FILE,
# AWS_BUCKET (+ optional AWS_ENDPOINT/REGION/keys for s3a), optional
# POSTGRES_SERVICE_* or ACG_CONFIG for the JDBC source, optional
# GRAFT_TABLE_DIR for parquet-view mode. Exit code propagates: 1 if any
# dump failed (floorist.py:290-292 parity).
exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "${SPARK_MASTER:-local[*]}" \
  --conf spark.sql.session.timeZone=UTC \
  --class graft.core.Floorista \
  /opt/app/graft.jar "$@"

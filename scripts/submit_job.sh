#!/usr/bin/env bash
# Package the engine and launch the pipeline via spark-submit --py-files,
# the north_rule's cluster launch path. On a real cluster swap --master.
#
# usage: scripts/submit_job.sh [extra cli.py args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/alas.zip"
(cd "$REPO" && zip -qr "$ZIP" access_log_aggregator_spark -x '*__pycache__*')

MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/access_log_aggregator_spark/cli.py" "$@"

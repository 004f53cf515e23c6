#!/usr/bin/env bash
# Ship the pipeline to a real cluster exactly as the north rule specifies:
# spark-submit --py-files with the zipped package. On the sandbox this runs
# against local-cluster[N,2,6144] (separate executor JVMs); on a real
# cluster replace --master with yarn/k8s/standalone and size executors via
# --num-executors / --executor-cores / --executor-memory.
#
# Usage: scripts/submit.sh [master] [transcripts_parquet] [workdir] [extra
# run_pipeline.py flags...] — e.g. --triples-out /path for the partitioned
# canonical-triples materialization.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local-cluster[4,2,6144]}"
INPUT="${2:-}"
WORKDIR="${3:-/tmp/qse-submit-work}"
shift $(( $# > 3 ? 3 : $# ))

ZIP=$(python - <<EOF
import sys
sys.path.insert(0, "$REPO")
from qse_spark.session import _package_zip
print(_package_zip())
EOF
)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/scripts/run_pipeline.py" ${INPUT:+--input "$INPUT"} --workdir "$WORKDIR" "$@"

#!/usr/bin/env bash
# End-to-end spark-submit --py-files smoke (north rule's execution mode):
# package the library as a zip, run scripts/submit_job.py from a scratch
# cwd with NO repo on sys.path — imports must come from the shipped zip.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

cd "$REPO"
zip -qr "$WORK/graphrag_mrkr_2_spark.zip" graphrag_mrkr_2_spark -x '*__pycache__*'
cp scripts/submit_job.py "$WORK/"

cd "$WORK"   # leave the repo so the package can only come from the zip
spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-4}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-4}" \
  --py-files "$WORK/graphrag_mrkr_2_spark.zip" \
  "$WORK/submit_job.py" \
  --demo-pages "${SPARK_GRAFT_DEMO_PAGES:-200}" \
  --out "$WORK/out" \
  2> "$WORK/submit.log" | tail -1

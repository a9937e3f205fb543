#!/usr/bin/env bash
# Package the engine and run the KG job via spark-submit --py-files.
# Locally: MASTER=local[32]; on a cluster: MASTER=yarn|k8s://... unchanged.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[32]}"
PAGES="${PAGES:-synthetic:500}"
OUT="${OUT:-/tmp/kg_catalog}"
PARTITIONS="${PARTITIONS:-64}"
FORMAT="${FORMAT:-parquet}"

ZIP=/tmp/graphrag_mrkr_2_spark.zip
rm -f "$ZIP"
python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('graphrag_mrkr_2_spark'):
        if '__pycache__' in root: continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('packaged', '$ZIP')
"

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="$PARTITIONS" \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  scripts/kg_job.py --pages "$PAGES" --output "$OUT" --partitions "$PARTITIONS" --format "$FORMAT" "$@"

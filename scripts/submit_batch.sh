#!/usr/bin/env bash
# North-rule launch shape: spark-submit --py-files on a cluster.
# Usage: scripts/submit_batch.sh <pages_dir> <out_dir> [extra spark-submit args...]
# On a real cluster add e.g.:  --master yarn --deploy-mode cluster \
#   --num-executors 200 --executor-cores 5 --executor-memory 16g \
#   --conf spark.sql.shuffle.partitions=2000
set -euo pipefail
PAGES="$1"; OUT="$2"; shift 2
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/cfht2caom2_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" cfht2caom2_spark)
exec spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  "$@" \
  "$REPO/scripts/batch_main.py" --pages "$PAGES" --out "$OUT"

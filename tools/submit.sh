#!/usr/bin/env bash
# Package osm2world_spark and spark-submit a job with --py-files — the
# cluster deployment path named in the target spec (multi-executor
# clusters get the library as a zip; local sandbox runs use the same
# command with --master local[N]).
#
#   tools/submit.sh jobs/tile_pipeline_job.py [spark-submit args...] -- [job args...]
#
# Example (two parallelism levels for the scaling protocol):
#   tools/submit.sh jobs/tile_pipeline_job.py --master 'local[8]'  -- --n-docs 40000 --out /tmp/o8
#   tools/submit.sh jobs/tile_pipeline_job.py --master 'local[32]' -- --n-docs 40000 --out /tmp/o32
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
JOB="${1:?usage: submit.sh <job.py> [spark args...] -- [job args...]}"
shift

SPARK_ARGS=()
JOB_ARGS=()
seen_sep=0
for a in "$@"; do
  if [[ "$a" == "--" ]]; then seen_sep=1; continue; fi
  if [[ $seen_sep == 0 ]]; then SPARK_ARGS+=("$a"); else JOB_ARGS+=("$a"); fi
done

ZIP="$(mktemp -d)/osm2world_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'EOF'
import sys, zipfile, pathlib
zip_path = sys.argv[1]
root = pathlib.Path("osm2world_spark")
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print(f"packaged {zip_path}")
EOF
)

SUBMIT="$(command -v spark-submit || echo "$SPARK_HOME/bin/spark-submit")"
exec "$SUBMIT" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "${SPARK_ARGS[@]}" \
  "$REPO/$JOB" "${JOB_ARGS[@]}"

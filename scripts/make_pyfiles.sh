#!/usr/bin/env bash
# Package xorf_spark for cluster submission:
#   ./scripts/make_pyfiles.sh
#   spark-submit --py-files dist/xorf_spark.zip your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/xorf_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/xorf_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("xorf_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/xorf_spark.zip")
EOF

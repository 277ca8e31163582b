#!/bin/sh
# Package the engine for spark-submit --py-files (north rule packaging).
#
#   sh tools/build_pyfiles.sh
#   spark-submit --py-files dist/upgini_spark.zip your_job.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/upgini_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/upgini_spark.zip", "w", zipfile.ZIP_DEFLATED) as zf:
    for root, dirs, files in os.walk("upgini_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                zf.write(p, p)
print("wrote dist/upgini_spark.zip")
EOF

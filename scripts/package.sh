#!/bin/sh
# Build the --py-files artifact for spark-submit:
#   sh scripts/package.sh  ->  dist/sift_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sift_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/sift_spark.zip", "w", zipfile.ZIP_DEFLATED) as zf:
    for root, _dirs, files in os.walk("sift_spark"):
        if "__pycache__" in root:
            continue
        for name in files:
            if name.endswith(".py"):
                path = os.path.join(root, name)
                zf.write(path, path)
print("wrote dist/sift_spark.zip")
EOF

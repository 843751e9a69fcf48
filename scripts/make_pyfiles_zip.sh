#!/bin/sh
# Build dist/loong_spark.zip for spark-submit --py-files deployment.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/loong_spark.zip
# package sources only (no caches/tests)
find loong_spark -name '*.py' | zip -q dist/loong_spark.zip -@ 2>/dev/null || \
  python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/loong_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("loong_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
EOF
echo "dist/loong_spark.zip:"
python -c "import zipfile; print('\n'.join(zipfile.ZipFile('dist/loong_spark.zip').namelist()))"

#!/bin/sh
# Build the --py-files artifact for spark-submit on a real cluster:
#   sh scripts/package_pyfiles.sh  →  dist/rust_html2text_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/rust_html2text_spark.zip
python - <<'PY'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/rust_html2text_spark.zip", "w") as z:
    for p in sorted(Path("rust_html2text_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/rust_html2text_spark.zip")
PY

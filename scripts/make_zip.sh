#!/usr/bin/env bash
# Package the extraction engine for cluster deployment:
#   spark-submit --py-files dist/extractor.zip scripts/run_extraction.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/extractor.zip
# zip only the package sources (no caches, no tests)
find extractor -name '*.py' | zip -q dist/extractor.zip -@
echo "dist/extractor.zip:"
unzip -l dist/extractor.zip | tail -3

#!/usr/bin/env bash
# Format/normalize sources (reference aux/fix.sh runs isort+black; neither is
# baked into this image, so fall back to whatever is available).
set -e
cd "$(dirname "$0")/.."
if command -v black >/dev/null 2>&1; then
  black ptdeco_tpu apps tests aux
fi
if command -v isort >/dev/null 2>&1; then
  isort ptdeco_tpu apps tests aux
fi
python -m compileall -q ptdeco_tpu apps tests
echo OK

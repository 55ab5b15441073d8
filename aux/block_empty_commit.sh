#!/usr/bin/env bash
# Refuse to create an empty version-bump commit (reference
# aux/block_empty_commit.sh).
if git diff --cached --quiet; then
  echo "Nothing staged - refusing to commit" >&2
  exit 1
fi

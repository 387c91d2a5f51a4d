#!/bin/bash
# Per-file test-suite runner with one retry per file.
#
# Why: long pytest processes on this 1-core host hit a flaky XLA:CPU
# interpreter abort (SIGABRT out of the AOT compile-cache writer /
# fiber runtime) that kills the whole run tens of minutes in.  Running
# each test file in its own subprocess isolates the crash; one retry
# absorbs the (rare, nondeterministic) repeat.  Results accumulate in
# $GFE_SUITE_RESULTS (default /tmp/suite_chunk_results.txt); already-
# green files are skipped, so an interrupted run resumes for free.
#
# Usage: bash tools/run_suite.sh [pytest-file-glob...]
set -u
cd "$(dirname "$0")/.."
RESULTS="${GFE_SUITE_RESULTS:-/tmp/suite_chunk_results.txt}"
touch "$RESULTS"
FILES=("$@")
if [ ${#FILES[@]} -eq 0 ]; then FILES=(tests/test_*.py); fi
for f in "${FILES[@]}"; do
  if grep -q "^$f \[try [12]\]: .*passed" "$RESULTS"; then continue; fi
  for attempt in 1 2; do
    out=$(timeout 2400 python -m pytest "$f" -q --tb=line 2>&1 | tail -3)
    line=$(echo "$out" | grep -E "passed|failed|error" | tail -1)
    if [ -n "$line" ]; then
      echo "$f [try $attempt]: $line" >> "$RESULTS"
      break
    fi
    if [ $attempt -eq 2 ]; then
      echo "$f [try 2]: CRASHED twice" >> "$RESULTS"
    fi
  done
done
echo ALL_DONE >> "$RESULTS"

#!/bin/bash
# Time every test module individually (3 parallel workers), recording wall
# seconds and per-test durations.  Used to decide `slow` marks empirically.
set -u
OUT=${1:-/tmp/test_timings}
PER_MODULE_TIMEOUT=${PER_MODULE_TIMEOUT:-2400}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run_one() {
  f=$1
  name=$(basename "$f" .py)
  start=$(date +%s)
  timeout "$PER_MODULE_TIMEOUT" python -m pytest "$f" -q --durations=0 \
    -p no:cacheprovider -m "" > "$OUT/$name.log" 2>&1
  rc=$?
  end=$(date +%s)
  echo -e "$name\t$((end-start))\t$rc" >> "$OUT/summary.tsv"
}
export -f run_one
export OUT PER_MODULE_TIMEOUT

ls tests/test_*.py | xargs -P 3 -I{} bash -c 'run_one "$1"' _ {}
echo DONE >> "$OUT/summary.tsv"

#!/bin/bash
# Run the pytest suite as per-file processes, N at a time (no xdist on
# this box).  Each file gets its own SparkSession (conftest: cpus=8),
# so concurrency is bounded to keep CPU/memory sane.
# Usage: tools/partest.sh [concurrency] [outdir]
set -u
CONC=${1:-5}
OUT=${2:-/tmp/partest}
mkdir -p "$OUT"
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-8g}
FILES=$(ls tests/test_*.py)
run_one() {
  f=$1
  base=$(basename "$f" .py)
  python -m pytest "$f" -q --no-header > "$OUT/$base.log" 2>&1
  echo "$? $base" >> "$OUT/results.txt"
}
rm -f "$OUT/results.txt"
i=0
for f in $FILES; do
  run_one "$f" &
  i=$((i+1))
  if [ $((i % CONC)) -eq 0 ]; then wait; fi
done
wait
echo "=== results ==="
sort -k2 "$OUT/results.txt"
grep -h -E "passed|failed|error" "$OUT"/*.log | tail -20

#!/bin/bash
# Round-5 chip evidence queue under wedge weather: each task retries
# with a bounded timeout until its success marker appears in its own
# log, then the queue moves on.  Tasks are ordered by evidence value.
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/r5_queue}
mkdir -p "$OUT"

task() {  # name attempts timeout marker cmd...
  local name=$1 attempts=$2 t=$3 marker=$4
  shift 4
  local log="$OUT/$name.log"
  : > "$log"
  for i in $(seq 1 "$attempts"); do
    echo "== $name attempt $i $(date +%H:%M:%S)" >> "$OUT/queue.log"
    timeout "$t" "$@" >> "$log" 2>&1
    if grep -q "$marker" "$log"; then
      echo "== $name OK $(date +%H:%M:%S)" >> "$OUT/queue.log"
      return 0
    fi
    sleep 20
  done
  echo "== $name GAVE UP $(date +%H:%M:%S)" >> "$OUT/queue.log"
  return 1
}

task bench_full 3 1100 headline_suite env BENCH_BUDGET_S=600 python bench.py
task periodic_drive 3 900 '"case": "quasi_periodic"' \
  python benchmarks/drive_periodic_whittle_r5.py
task whittle_a 4 400 whittle2d env BENCH_MODE=whittle python bench.py
task whittle_b 4 400 whittle2d env BENCH_MODE=whittle python bench.py
task ski65k_a 2 1800 ski_kron_refine env BENCH_MODE=ski_refine \
  BENCH_SKIREF_N=65536 BENCH_SKIREF_M1=128 BENCH_SKIREF_ITERS=300 \
  BENCH_SKIREF_RANK=512 BENCH_SKIREF_ROUNDS=2 python bench.py
task ski65k_b 2 1800 ski_kron_refine env BENCH_MODE=ski_refine \
  BENCH_SKIREF_N=65536 BENCH_SKIREF_M1=128 BENCH_SKIREF_ITERS=300 \
  BENCH_SKIREF_RANK=512 BENCH_SKIREF_ROUNDS=2 python bench.py
echo "QUEUE DONE $(date +%H:%M:%S)" >> "$OUT/queue.log"

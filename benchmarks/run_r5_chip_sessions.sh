#!/bin/bash
# Round-5 chip evidence sessions, back-to-back on an idle host, run
# AFTER the 1M acceptance run frees the chip.  Order: the new
# line-spectrum drive first (verifies round-5 code on hardware), then
# the full budgeted bench (the BENCH_r05 rc=0 rehearsal), then the 65k
# ski_refine at full size TWICE in one session — the steady walls must
# agree within +/-15% (VERDICT r4 item 5's reconciliation), with
# compile_s separated by the two-pass protocol.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r5_chip_sessions.txt}
: > "$LOG"
stage() {
  echo "===== $1 (start $(date +%H:%M:%S)) =====" >> "$LOG"
  local t=$2
  shift 2
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "===== rc=$? end $(date +%H:%M:%S) =====" >> "$LOG"
}
stage periodic_whittle 1800 python benchmarks/drive_periodic_whittle_r5.py
stage bench_full       1500 python bench.py
# second whittle run in the same session: VERDICT r4 item 3's done
# criterion is vs_baseline stable across two consecutive runs
stage whittle_again    600  env BENCH_MODE=whittle python bench.py
stage ski_refine65k_a  1800 env BENCH_MODE=ski_refine BENCH_SKIREF_N=65536 \
  BENCH_SKIREF_M1=128 BENCH_SKIREF_ITERS=300 BENCH_SKIREF_RANK=512 \
  BENCH_SKIREF_ROUNDS=2 python bench.py
stage ski_refine65k_b  1800 env BENCH_MODE=ski_refine BENCH_SKIREF_N=65536 \
  BENCH_SKIREF_M1=128 BENCH_SKIREF_ITERS=300 BENCH_SKIREF_RANK=512 \
  BENCH_SKIREF_ROUNDS=2 python bench.py
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"

#!/bin/bash
# Round-4 chip evidence sessions, back-to-back on an idle host
# (VERDICT r3 items 2, 3, 4, 7).  Each stage appends to one log with
# markers; failures don't stop later stages.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/r4_chip_sessions.txt}
: > "$LOG"
stage() {
  echo "===== $1 (start $(date +%H:%M:%S)) =====" >> "$LOG"
  shift
  timeout 900 "$@" >> "$LOG" 2>&1
  echo "===== rc=$? end $(date +%H:%M:%S) =====" >> "$LOG"
}
stage chees       env BENCH_MODE=chees python bench.py
stage nuts        env BENCH_MODE=nuts python bench.py
stage fit         env BENCH_MODE=fit python bench.py
stage chol        env BENCH_MODE=chol python bench.py
stage roofline    python benchmarks/probe_chol_roofline.py
stage hessian     python benchmarks/probe_hessian_chip.py
stage ski_refine  env BENCH_MODE=ski_refine python bench.py
stage ski_phases  python benchmarks/probe_ski_phases.py
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"

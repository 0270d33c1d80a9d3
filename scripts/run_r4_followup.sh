#!/bin/bash
# Round-4 follow-up A/Bs, run after run_r4_sweep.sh: isolate whether the
# fused2 e2e loss vs the unfused default (31.8 vs 50.5 tiles/s in the r3
# leg) is a batch artifact (fused2 forces b8, unfused defaults to b4), and
# re-pin the two e2e baselines in the same session for drift control.
set -u
OUT=${1:-/tmp/r4_followup.log}
export TOMOSAR_BENCH_SKIP_PROBE=1
cd "$(dirname "$0")/.."
echo "=== r4 followup $(date -u +%FT%TZ) ===" | tee -a "$OUT"
run() {
  echo "--- $* ---" | tee -a "$OUT"
  timeout 1800 python "$@" 2>&1 | grep -v "^WARNING" | tail -4 | tee -a "$OUT"
}
run bench.py --e2e --device-blend --big --fused fused2 --batch 4
run bench.py --e2e --device-blend --big --batch 8
run bench.py --e2e --device-blend --big
run bench.py --e2e --device-blend --big --fused fused2
echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$OUT"

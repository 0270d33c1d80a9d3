#!/bin/bash
# Resume of run_r4_train_ab.sh after a driver-session end killed it mid-leg-5.
# Completed before the kill (recorded in /tmp/r4_train_ab.log, appended here):
#   b8 fused2 37.3 | b8 fused 19.9* | b8 none 26.8* | b4 fused2 29.8
#   (* = overlapped a stray CPU-smoke that landed on the TPU 04:36-04:47Z —
#    re-run below for clean numbers)
# One TPU client at a time — run alone.
set -u -o pipefail
OUT=${1:-/tmp/r4_train_ab.log}
export TOMOSAR_BENCH_SKIP_PROBE=1
cd "$(dirname "$0")/.."
echo "=== r4 train A/B resume $(date -u +%FT%TZ) ===" | tee -a "$OUT"
run() {
  # echo the exit status so a failed/timed-out leg can't be misread as a
  # quiet success when the log is mined for RESULTS numbers (ADVICE r04)
  echo "--- $* ---" | tee -a "$OUT"
  timeout 1800 python "$@" 2>&1 | grep -v "^WARNING" | tail -4 | tee -a "$OUT"
  echo "--- exit $? ---" | tee -a "$OUT"
}
# remaining legs of the original plan
run bench.py --train --batch 4 --fused fused --iters 80
run bench.py --train --batch 4 --fused none --iters 80
run bench.py --train --batch 4 --points 8192 --iters 80
# clean re-runs of the contaminated b8 legs
run bench.py --train --fused fused --iters 80
run bench.py --train --fused none --iters 80

# e2e refinements on the r4-sweep finding (fused2 b4 = 57.3 beats the r3
# default): scan-blend and u16-wire variants of the new winner
run bench.py --e2e --device-blend --big --fused fused2 --batch 4 --blend-scan
run bench.py --e2e --device-blend --big --fused fused2 --batch 4 --wire-u16

# re-runs: these two r4-sweep legs collided with a stray test.py holding the
# chip (FAILED_PRECONDITION / contended timing)
run bench.py --e2e --image --device-blend
run bench.py --e2e --image --device-blend --fused fused2 --wire-u8img --wire-u16
echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$OUT"

#!/bin/bash
# Resume of run_r4_sweep.sh from the serving --batch 16 entry (the first
# r4 leg recorded train b4/b8/b16 and serving b4/b1 before the driver
# session ended, see /tmp/r4_sweep.log). Also folds in the
# run_r4_followup.sh legs (fused2-vs-unfused e2e batch disambiguation).
# One TPU client at a time — run alone.
# Usage: bash scripts/run_r4_sweep_resume.sh [outfile]
set -u
OUT=${1:-/tmp/r4_sweep.log}
export TOMOSAR_BENCH_SKIP_PROBE=1
cd "$(dirname "$0")/.."
echo "=== r4 chip sweep resume $(date -u +%FT%TZ) ===" | tee -a "$OUT"

run() {
  echo "--- $* ---" | tee -a "$OUT"
  timeout 1800 python "$@" 2>&1 | grep -v "^WARNING" | tail -4 | tee -a "$OUT"
}

# 2. (tail) serving batch sweep + plain-path drift control
run bench.py --batch 16
run bench.py --fused none --batch 1 --iters 60

# 3. cloud+image fusion flagship (the paper's headline config)
run bench.py --image
run bench.py --image --train
run bench.py --image --train --wire-u8img
run bench.py --e2e --image --device-blend --fused fused2
run bench.py --e2e --image --device-blend --fused fused2 --wire-u8img --wire-u16
run bench.py --e2e --image --device-blend --fused fused2 --device-img --wire-u16
run bench.py --e2e --image --device-blend
run bench.py --e2e --image --device-blend --device-img

# 4. device-blend loop A/B: unrolled RMW chain vs lax.scan (e1a1390)
run bench.py --e2e --device-blend --big --blend-scan
run bench.py --e2e --device-blend --big --fused fused2 --blend-scan

# 5. e2e fused2-vs-unfused disambiguation (followup): same batch both ways
run bench.py --e2e --device-blend --big --fused fused2 --batch 4
run bench.py --e2e --device-blend --big --batch 8
run bench.py --e2e --device-blend --big
run bench.py --e2e --device-blend --big --fused fused2 --wire-u16

# 6. PointNet++ alternate encoder (micro benches only)
run bench.py --encoder pointnet_plus_plus
run bench.py --encoder pointnet_plus_plus --train

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$OUT"

#!/bin/bash
# Round-4 on-chip sweep: resume of run_r3_chip_measurements.sh from the
# --train entry (the r3 sweep recorded everything before it, see
# /tmp/r3_measurements.log / RESULTS.md), plus the round-4 additions:
# the b16 training cliff probe, the PointNet++ alternate encoder bench,
# the lax.scan device-blend A/B, and a wire-u16 e2e recheck (the first
# run's 13.8 tiles/s had an anomalous 2.45 s finalize phase).
# One TPU client at a time — run alone.
# Usage: bash scripts/run_r4_sweep.sh [outfile]
set -u
OUT=${1:-/tmp/r4_sweep.log}
export TOMOSAR_BENCH_SKIP_PROBE=1
cd "$(dirname "$0")/.."
echo "=== r4 chip sweep $(date -u +%FT%TZ) ===" | tee -a "$OUT"

run() {
  echo "--- $* ---" | tee -a "$OUT"
  timeout 1800 python "$@" 2>&1 | grep -v "^WARNING" | tail -4 | tee -a "$OUT"
}

# 1. training: fused2 full fused bwd + the b4/b16 cliff probe
run bench.py --train
run bench.py --train --batch 4
run bench.py --train --batch 16

# 2. serving batch sweep + plain-path drift control
run bench.py --batch 4
run bench.py --batch 1
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

# 5. wire-u16 e2e recheck (first run: anomalous 2.45 s finalize)
run bench.py --e2e --device-blend --big --fused fused2 --wire-u16

# 6. PointNet++ alternate encoder (micro benches only)
run bench.py --encoder pointnet_plus_plus
run bench.py --encoder pointnet_plus_plus --train

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$OUT"

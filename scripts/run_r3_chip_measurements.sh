#!/bin/bash
# Round-3 on-chip measurement sweep: super-tile (32x32) chunk-grid kernels +
# wire-slim serving. One TPU client at a time — run alone (see
# .claude/skills/verify: a second process's first jit blocks forever).
# Usage: bash scripts/run_r3_chip_measurements.sh [outfile]
set -u
OUT=${1:-/tmp/r3_measurements.log}
# every run is already bounded by `timeout 1800`; skip bench.py's own
# backend-availability probe (it would re-pay jax startup 17 times)
export TOMOSAR_BENCH_SKIP_PROBE=1
cd "$(dirname "$0")/.."
echo "=== r3 chip sweep $(date -u +%FT%TZ) ===" | tee -a "$OUT"

run() {
  echo "--- $* ---" | tee -a "$OUT"
  timeout 1800 python "$@" 2>&1 | grep -v "^WARNING" | tail -4 | tee -a "$OUT"
}

# Ordered by decision value (the tunnel has multi-hour outages; front-load
# what changes defaults / headline numbers if it drops again mid-sweep).

# 1. headline: fused2 super-tile at the b8 default
run bench.py

# 2. fused decoder head / conv-pair A/Bs (the largest remaining trace
#    category; decides whether they become defaults)
run bench.py --fused-head
run bench.py --fused-convs
run bench.py --fused-head --fused-convs
run bench.py --fused-head --fused-convs --batch 4
run bench.py --fused-head --batch 4

# 3. e2e serving: device blend + wire-slim loader (native morton, no cells
#    upload, no GT crop) + banded early fetch on the 48-patch big city
run bench.py --e2e --device-blend --big --fused fused2
run bench.py --e2e --device-blend --big --fused fused2 --wire-u16
run bench.py --e2e --device-blend --big

# 4. training: fused2 full fused bwd
run bench.py --train
run bench.py --train --batch 4

# 5. serving batch sweep + plain-path drift control
run bench.py --batch 4
run bench.py --batch 1
run bench.py --batch 16
run bench.py --fused none --batch 1 --iters 60

# 6. cloud+image fusion flagship (the paper's headline config)
run bench.py --image
run bench.py --image --train
run bench.py --image --train --wire-u8img
run bench.py --e2e --image --device-blend --fused fused2
run bench.py --e2e --image --device-blend --fused fused2 --wire-u8img --wire-u16
# device-resident scene image: upload once, crop per tile on device (the
# per-tile image crop was the dominant cloud+image upload)
run bench.py --e2e --image --device-blend --fused fused2 --device-img --wire-u16
echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$OUT"

#!/bin/bash
# Round-4 training-throughput regression probe. r3 (commit 8def664, pre
# super-tile) measured 25.5/32.6/22.2 patches/s at b4/b8/b16; the r4 sweep
# measured 12.3/25.8/25.6 — super-tile fixed the b16 cliff but b4/b8 now sit
# on a ~310 ms batch-independent floor. These legs separate the kernel layout
# (fused2 32x32 vs fused 16x16 vs none) from the trainer/upload path, and
# double the iteration count for noise control.
# One TPU client at a time — run alone.
set -u
OUT=${1:-/tmp/r4_train_ab.log}
export TOMOSAR_BENCH_SKIP_PROBE=1
cd "$(dirname "$0")/.."
echo "=== r4 train A/B $(date -u +%FT%TZ) ===" | tee -a "$OUT"
run() {
  echo "--- $* ---" | tee -a "$OUT"
  timeout 1800 python "$@" 2>&1 | grep -v "^WARNING" | tail -4 | tee -a "$OUT"
}
run bench.py --train --iters 80
run bench.py --train --fused fused --iters 80
run bench.py --train --fused none --iters 80
run bench.py --train --batch 4 --iters 80
run bench.py --train --batch 4 --fused fused --iters 80
run bench.py --train --batch 4 --fused none --iters 80
run bench.py --train --batch 4 --points 8192 --iters 80

# e2e refinements on the r4-sweep finding (fused2 b4 = 57.3 beats the r3
# default): scan-blend and u16-wire variants of the new winner
run bench.py --e2e --device-blend --big --fused fused2 --batch 4 --blend-scan
run bench.py --e2e --device-blend --big --fused fused2 --batch 4 --wire-u16

# re-runs: these two r4-sweep legs collided with a stray test.py holding the
# chip (FAILED_PRECONDITION / contended timing)
run bench.py --e2e --image --device-blend
run bench.py --e2e --image --device-blend --fused fused2 --wire-u8img --wire-u16
echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$OUT"

#!/bin/bash
# Round-5 chip measurement queue (VERDICT r04 items 3/4/5/6). Run AFTER the
# flagship 10k completes — one TPU client at a time.
#
# Noise criterion (item 6): every number that justifies a default or a README
# headline runs TWO CONSECUTIVE legs; the pair must agree within 10% or the
# table flags it as noisy. Exit status is echoed per leg so a dead leg can't
# be misread as a quiet success.
set -u -o pipefail
OUT=${1:-/tmp/r5_measurements.log}
export TOMOSAR_BENCH_SKIP_PROBE=1
cd "$(dirname "$0")/.."
run() {
  echo "--- $* $(date -u +%FT%TZ) ---" | tee -a "$OUT"
  timeout 2400 python "$@" 2>&1 | grep -v "^WARNING" | tail -4 | tee -a "$OUT"
  echo "--- exit $? ---" | tee -a "$OUT"
}

echo "=== r5 measurements $(date -u +%FT%TZ) ===" | tee -a "$OUT"

# 1. roofline anchors — measured HBM BW + MXU peak for the MFU lines (item 5)
run scripts/profile_roofline.py

# 2. training headline, two consecutive legs (items 4/6)
run bench.py --train --iters 80
run bench.py --train --iters 80

# 3. the noisy r4 legs re-run under the criterion (item 6):
#    b8 plain spread 14.1-26.8; b4 fused2 unexplained 25.5 -> 29.8 shift
run bench.py --train --fused none --iters 80
run bench.py --train --fused none --iters 80
run bench.py --train --batch 4 --fused fused2 --iters 80
run bench.py --train --batch 4 --fused fused2 --iters 80

# 4. serving headline micro-bench, two legs (same hour as MFU traces)
run bench.py
run bench.py

# 5. big-city fusion e2e — the four clean r4 configs on a >=48-patch scene
#    (item 3: the 8-patch scene had +-25% spread), two legs each
run bench.py --e2e --image --big --device-blend
run bench.py --e2e --image --big --device-blend
run bench.py --e2e --image --big --device-blend --fused fused2 --wire-u8img --wire-u16
run bench.py --e2e --image --big --device-blend --fused fused2 --wire-u8img --wire-u16
run bench.py --e2e --image --big --device-blend --device-img
run bench.py --e2e --image --big --device-blend --device-img
run bench.py --e2e --image --big --device-blend --device-img --fused fused2
run bench.py --e2e --image --big --device-blend --device-img --fused fused2

# 6. cloud-only e2e headline continuity, two legs
run bench.py --e2e --device-blend --big --fused fused2 --batch 4
run bench.py --e2e --device-blend --big --fused fused2 --batch 4

# 7. device traces of the two headline configs (item 5: whole-step MFU +
#    top remaining device-time categories). Categorizer prints per-category
#    device time; MFU = flops (scripts/mfu_accounting.py --count) / device
#    time / measured peak (leg 1).
runfull() {  # categorizer tables need more than the last 4 lines
  echo "--- $* $(date -u +%FT%TZ) ---" | tee -a "$OUT"
  timeout 2400 python "$@" 2>&1 | grep -v "^WARNING" | tail -60 | tee -a "$OUT"
  echo "--- exit $? ---" | tee -a "$OUT"
}
runfull scripts/profile_trace.py --fused fused2 --batch 8 \
    --out /tmp/r5_trace_serving
runfull scripts/profile_trace.py --train --fused fused2 --batch 8 \
    --out /tmp/r5_trace_train

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$OUT"

#!/usr/bin/env bash
# Sweep test.py over periodic checkpoints (reference scripts/multi_eval.bash:1-14).
# Usage: scripts/multi_eval.sh <dataset> <run_suffix> [start step stop] [extra overrides...]
set -euo pipefail
DATASET="${1:?dataset}"
SUFFIX="${2:-}"
START="${3:-100}"
STEP="${4:-100}"
STOP="${5:-10000}"
shift $(( $# > 5 ? 5 : $# ))
HERE="$(cd "$(dirname "$0")/.." && pwd)"

for ((i=START; i<=STOP; i+=STEP)); do
  CKPT="outputs/TomoSAR2Height-${DATASET}${SUFFIX}/check_points/model_${i}.ckpt"
  if [[ -f "$CKPT" ]]; then
    echo "== evaluating $CKPT =="
    python "$HERE/test.py" "dataset=${DATASET}" "run_suffix=${SUFFIX}" \
      "test.check_point=${CKPT}" "$@"
  fi
done

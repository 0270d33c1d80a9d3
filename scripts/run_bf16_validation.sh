#!/usr/bin/env bash
# bf16 convergence validation to COMPLETION (VERDICT r02 item 5): 150-iteration
# flagship training on the bench city in bfloat16, checkpoint-resuming across
# invocations so job timeouts can't truncate the run again. Compare the val-L1
# column against RESULTS.md's f32 leg (both batch 8 x optimize_every 8, remat).
set -u
cd "$(dirname "$0")/.."
# Own city dir — NEVER share .bench/city with bench.py: bench.py rmtree's and
# rebuilds that dir on any stamp mismatch, which would swap the training data
# mid-run between resume attempts (ADVICE r04). Same density/seed as the
# flagship city (0.055 fills the 16k bucket without overflow).
ROOT=$PWD/.bench/city_bf16
OUT=$PWD/.bench/outputs
RUN="$OUT/TomoSAR2Height-synthetic-bf16r3"

if [ ! -f "$ROOT/raster/ndsm.tif" ]; then
  echo "=== generating bf16-validation city ==="
  python scripts/make_synthetic_city.py --out "$ROOT" --seed 0 --density 0.055
fi

OV="dataset=synthetic dataset.path=$ROOT/generated gt_dsm=$ROOT/raster/ndsm.tif \
input_pointcloud_folder=$ROOT/cloud output.output_folder=$ROOT/generated \
mask_files.building=$ROOT/raster/footprint.tif \
dataset.mask_files.building=$ROOT/raster/footprint.tif \
dataset.mask_files.type=$ROOT/raster/building_class.tif \
dataset.satellite_image.folder=$ROOT/raster \
use_cloud=true use_image=false use_footprint=false \
dataset.points.train_bucket=16384 dataset.points.bucket_sizes=[16384] \
training.out_dir=$OUT run_suffix=-bf16r3 \
training.batch_size=8 training.optimize_every=8 training.max_iteration=150 \
training.validate_every=5 training.checkpoint_every=5 \
training.visualize_every=100000 model.dtype=bfloat16"

if [ ! -d "$ROOT/generated/chunk_000" ]; then
  echo "=== building dataset ==="
  python scripts/build_dataset.py $OV
fi

for attempt in 1 2 3 4; do
  LATEST=$(ls "$RUN"/check_points/model_*.ckpt 2>/dev/null \
           | grep -v best | sed 's/.*model_\([0-9]*\).ckpt/\1 &/' \
           | sort -n | tail -1 | cut -d' ' -f2)
  EXTRA=""
  [ -n "${LATEST:-}" ] && EXTRA="training.resume_from=$LATEST"
  echo "=== bf16 validation attempt $attempt (resume: ${LATEST:-none}) ==="
  timeout "${BF16_TIMEOUT:-3300}" python train.py $OV $EXTRA && break
done
echo "=== final: per-iteration val metrics ==="
grep -h loss_l1 "$RUN"/wandb/metrics.jsonl | tail -40

#!/usr/bin/env bash
# Full-schedule flagship training run (VERDICT r03 item 4): the reference's
# production schedule — 64 patches per optimizer step (batch 8 x accumulate 8,
# conf/model/tomosar2height.yaml:40-44 in the reference) with CyclicLR
# triangular2 cycling (step 500/500), periodic checkpoint/validate and in-loop
# visualize (full DSM generation + eval) — on the big synthetic city, bf16 +
# fused2 chunk-grid kernels, resuming across invocations so job timeouts /
# deliberate kills continue instead of truncating.
#
# Usage: bash scripts/run_flagship_schedule.sh [stop_epoch_seconds]
#   stop_epoch_seconds: wall-clock deadline (date +%s form). Default: +4h.
# Each leg is bounded by FLAGSHIP_LEG_TIMEOUT (default 50 min) and resumes
# from the newest periodic checkpoint — every leg boundary doubles as a
# kill-and-resume demonstration (reference train.py:129-137 semantics).
set -u
cd "$(dirname "$0")/.."
ROOT=$PWD/.bench/city_big
OUT=$PWD/.bench/outputs
RUN="$OUT/TomoSAR2Height-synthetic-flagship10k"
DEADLINE=${1:-$(( $(date +%s) + 4*3600 ))}

# the 12-chunk 3840x1280 m city bench.py --e2e --big builds; reuse or build
python - <<'EOF'
import os, sys
sys.path.insert(0, "scripts")
root = os.path.join(".bench", "city_big")
if not os.path.exists(os.path.join(root, "generated", "chunk_info.yaml")):
    import make_synthetic_city as msc
    from tomosar2height_tpu.config import compose
    from tomosar2height_tpu.config.compose import default_conf_dir
    from tomosar2height_tpu.data import build_dataset
    width, height = 3840, 1280
    cx = [float(v) for v in range(0, width + 1, 640)]
    cy = [5000000.0 + v for v in range(0, height + 1, 640)]
    msc.main(root, seed=0, density=0.055, width=width, height=height)
    cfg = compose(default_conf_dir(), overrides=[
        "dataset=synthetic", f"dataset.path={root}/generated",
        f"gt_dsm={root}/raster/ndsm.tif",
        f"input_pointcloud_folder={root}/cloud",
        f"output.output_folder={root}/generated",
        f"mask_files.building={root}/raster/footprint.tif",
        f"dataset.mask_files.building={root}/raster/footprint.tif",
        f"dataset.mask_files.type={root}/raster/building_class.tif",
        f"dataset.satellite_image.folder={root}/raster",
        f"chunk.chunk_x={cx}".replace(" ", ""),
        f"chunk.chunk_y={cy}".replace(" ", ""),
    ])
    build_dataset(cfg, overwrite=True)
    print("[flagship] built the big city")
else:
    print("[flagship] big city present")
EOF

CX="[0.0,640.0,1280.0,1920.0,2560.0,3200.0,3840.0]"
CY="[5000000.0,5000640.0,5001280.0]"
# train on 10 chunks, validate on 1, visualize (full DSM gen + eval) on 1.
# Flagship config otherwise: 512 m patches, 16k point bucket, bf16 with f32
# heads, fused2 chunk-grid Pallas kernels, batch 8 x optimize_every 8,
# CyclicLR(triangular2, 500/500), 10k optimizer steps.
OV="dataset=synthetic dataset.path=$ROOT/generated gt_dsm=$ROOT/raster/ndsm.tif \
input_pointcloud_folder=$ROOT/cloud output.output_folder=$ROOT/generated \
mask_files.building=$ROOT/raster/footprint.tif \
dataset.mask_files.building=$ROOT/raster/footprint.tif \
dataset.mask_files.type=$ROOT/raster/building_class.tif \
dataset.satellite_image.folder=$ROOT/raster \
chunk.chunk_x=$CX chunk.chunk_y=$CY \
dataset.train_chunks=[0,1,2,3,4,5,6,7,8,9] dataset.val_chunks=[10] \
dataset.test_chunks=[11] dataset.vis_chunks=[11] \
use_cloud=true use_image=false use_footprint=false \
dataset.points.train_bucket=16384 dataset.points.bucket_sizes=[16384] \
dataset.points.sort=true model.encoder_kwargs.sorted_impl=fused2 \
model.dtype=bfloat16 \
training.out_dir=$OUT run_suffix=-flagship10k \
training.batch_size=8 training.optimize_every=8 training.val_batch_size=8 \
training.random_dataset_length=6400 \
training.max_iteration=10000 \
training.print_every=10 training.validate_every=100 \
training.checkpoint_every=100 training.visualize_every=500"

leg=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  leg=$((leg + 1))
  LATEST=$(ls "$RUN"/check_points/model_*.ckpt 2>/dev/null \
           | grep -v best | sed 's/.*model_\([0-9]*\).ckpt/\1 &/' \
           | sort -n | tail -1 | cut -d' ' -f2)
  EXTRA=""
  [ -n "${LATEST:-}" ] && EXTRA="training.resume_from=$LATEST"
  echo "=== flagship leg $leg $(date -u +%FT%TZ) (resume: ${LATEST:-none}) ==="
  timeout "${FLAGSHIP_LEG_TIMEOUT:-3000}" python train.py $OV $EXTRA
  rc=$?
  [ $rc -eq 0 ] && { echo "=== flagship run COMPLETE (leg $leg) ==="; break; }
  echo "=== leg $leg ended rc=$rc (124=timeout leg boundary); resuming ==="
done
echo "=== final trail ==="
grep -h '"iteration"' "$RUN"/wandb/metrics.jsonl 2>/dev/null | tail -3
ls "$RUN"/check_points/ 2>/dev/null | tail -5

#!/bin/bash
# End-to-end learning validation on the real chip, synthetic data.
#
# The published BASELINE numbers need datasets this environment doesn't have
# (docs/BENCHMARKS.md); this is the strongest *hardware* evidence available
# instead: the full reference pipeline — teacher pretrain -> GM3D pretrain
# with EMA/mask/distill -> classification finetune — run at real scale on the
# TPU with the 10-class synthetic blob dataset, asserting the SVM probe and
# finetune accuracy RISE well above the 10% chance floor. Results recorded in
# docs/BENCHMARKS.md ("Synthetic end-to-end convergence").
#
# Run from the repo root:  bash scripts/synthetic_convergence.sh [OUTROOT]
set -e
OUT=${1:-/tmp/gm3d_conv}
BS=128
SAMPLES=2560   # 20 steps/epoch at bs=128
mkdir -p "$OUT"

echo "=== stage 1/3: teacher pretrain (Point-MAE, random mask, Chamfer) ==="
python -m gm3d_tpu.cli.pretrain \
  --config configs/pointmae/config_m.yaml --model_family pointmae \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 25 --val_freq 5 --bf16 \
  --output_dir "$OUT/teacher" 2>&1 | grep -E "epoch|done|best"

echo "=== stage 2/3: GM3D pretrain (EMA + geometric mask + distillation) ==="
python -m gm3d_tpu.cli.pretrain \
  --config configs/pointmae/config.yaml \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 40 --val_freq 5 --bf16 \
  --teacher_ckpt "$OUT/teacher/ckpt" \
  --output_dir "$OUT/gm3d" 2>&1 | grep -E "epoch|done|best"

echo "=== stage 3/3: classification finetune from the GM3D checkpoint ==="
python -m gm3d_tpu.cli.finetune \
  --config configs/pointmae/finetune_modelnet.yaml \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 20 --bf16 \
  --pretrained "$OUT/gm3d/ckpt" \
  --output_dir "$OUT/ft" 2>&1 | grep -E "transfer|epoch|best"

echo "=== logs: $OUT/{teacher,gm3d,ft}/log.txt ==="

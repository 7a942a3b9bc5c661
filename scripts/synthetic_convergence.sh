#!/bin/bash
# End-to-end learning validation on the real chip, synthetic data.
#
# The published BASELINE numbers need datasets this environment doesn't have
# (docs/BENCHMARKS.md); this is the strongest *hardware* evidence available
# instead: the full reference pipeline — teacher pretrain -> GM3D pretrain
# with EMA/mask/distill -> classification finetune, plus (round 4) the
# M2AE+GM3D hierarchical family — run at real scale on the TPU with the
# 10-class synthetic blob dataset, asserting the SVM probe and finetune
# accuracy RISE well above the 10% chance floor. Results recorded in
# docs/BENCHMARKS.md ("Synthetic end-to-end convergence").
#
# Run from the repo root:  bash scripts/synthetic_convergence.sh [OUTROOT] [STAGES]
#   STAGES: comma list of 1,2,3,4,5 (default all), e.g. "4,5" for M2AE only
set -e
OUT=${1:-/tmp/gm3d_conv}
STAGES=${2:-1,2,3,4,5}
BS=128
SAMPLES=2560   # 20 steps/epoch at bs=128
mkdir -p "$OUT"
run_stage() { case ",$STAGES," in *",$1,"*) return 0;; *) return 1;; esac; }

run_stage 1 && {
echo "=== stage 1/5: teacher pretrain (Point-MAE, random mask, Chamfer) ==="
python -m gm3d_tpu.cli.pretrain \
  --config configs/pointmae/config_m.yaml --model_family pointmae \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 25 --val_freq 5 --bf16 \
  --output_dir "$OUT/teacher" 2>&1 | grep -E "epoch|done|best"
}

run_stage 2 && {
echo "=== stage 2/5: GM3D pretrain (EMA + geometric mask + distillation) ==="
python -m gm3d_tpu.cli.pretrain \
  --config configs/pointmae/config.yaml \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 40 --val_freq 5 --bf16 \
  --teacher_ckpt "$OUT/teacher/ckpt" \
  --output_dir "$OUT/gm3d" 2>&1 | grep -E "epoch|done|best"
}

run_stage 3 && {
echo "=== stage 3/5: classification finetune from the GM3D checkpoint ==="
python -m gm3d_tpu.cli.finetune \
  --config configs/pointmae/finetune_modelnet.yaml \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 20 --bf16 \
  --pretrained "$OUT/gm3d/ckpt" \
  --output_dir "$OUT/ft" 2>&1 | grep -E "transfer|epoch|best"
}

run_stage 4 && {
echo "=== stage 4/5: Point-M2AE + GM3D hierarchical pretrain ==="
python -m gm3d_tpu.cli.pretrain \
  --config configs/m2ae/config_Point_M2AE.yaml --model_family m2ae_gm3d \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 25 --val_freq 5 --bf16 \
  --output_dir "$OUT/m2ae" 2>&1 | grep -E "epoch|done|best"
}

run_stage 5 && {
echo "=== stage 5/5: M2AE classification finetune from the M2AE checkpoint ==="
python -m gm3d_tpu.cli.finetune \
  --config configs/m2ae/finetune_modelnet_PointM2AE.yaml \
  --synthetic --synthetic_samples $SAMPLES --batch_size $BS \
  --epochs 15 --bf16 \
  --pretrained "$OUT/m2ae/ckpt" \
  --output_dir "$OUT/m2ae_ft" 2>&1 | grep -E "transfer|epoch|best"
}

echo "=== logs: $OUT/{teacher,gm3d,ft,m2ae,m2ae_ft}/log.txt ==="

#!/usr/bin/env bash
# Round-2 "prove it learns" run (VERDICT.md #4): generate a real dataset,
# train the flagship FDN-UNet at the reference's training config
# (image 256, batch 16, lr 3e-4 — reference train_model.py:41-59), then
# score surrogate MAE with the accuracy CLI (reference bar: 0.0144,
# reference README.md:10, on 100k samples / 10k steps).
#
# Scaled-down by default (400 train + 16 eval plates ~= 8k train samples);
# override via env: PLATES=2500 STEPS=10000 bash examples/train_real.sh
set -euo pipefail

PLATES=${PLATES:-400}
EVAL_PLATES=${EVAL_PLATES:-16}
STEPS=${STEPS:-10000}
BS=${BS:-16}
ROOT=${ROOT:-runs}
DATA=$ROOT/train_data
EVAL=$ROOT/eval_data
RES=$ROOT/results

mkdir -p "$ROOT"

if [ ! -f "$DATA/.done" ]; then
  python -m fea_tpu generate --batched --batch_size 8 \
    --num_plates "$PLATES" --conditions_per_plate 4 --steps_per_condition 6 \
    --mesh_size 1e-2 --image_size 512 --save_displacement \
    --data_dir "$DATA" --seed 100
  touch "$DATA/.done"
fi

if [ ! -f "$EVAL/.done" ]; then
  # --save_meshes writes the per-step domain.N.vtk ground truth that the
  # accuracy CLI samples predictions against.
  python -m fea_tpu generate --batched --batch_size 8 \
    --num_plates "$EVAL_PLATES" --conditions_per_plate 4 --steps_per_condition 6 \
    --mesh_size 1e-2 --image_size 512 --save_displacement --save_meshes \
    --data_dir "$EVAL" --seed 900
  touch "$EVAL/.done"
fi

# Crash-resilient loop (the tunneled runtime OOM-kills long runs; see
# train_loop_resume.sh). Produces model-best/model-latest/model-final.
DATA="$DATA" EVAL="$EVAL" RES="$RES" STEPS="$STEPS" BS="$BS" \
  bash "$(dirname "$0")/train_loop_resume.sh"

# Render the best checkpoint's predictions for every eval sample, then
# score them against the domain.N.vtk ground truth.
python -m fea_tpu sample --milestone best \
  --data_dir "$DATA" --sample_data_dir "$EVAL" \
  --image_size 256 --batch_size "$BS" \
  --num_steps_per_condition 6 --num_sample_conditions_per_plate 4 \
  --results_dir "$RES"

python -m fea_tpu accuracy \
  --data_dir "$EVAL" --results_dir "$RES" --milestone best \
  --image_size 256 --num_plates "$EVAL_PLATES" --conditions_per_plate 4 \
  --steps_per_condition 6

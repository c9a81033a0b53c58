#!/usr/bin/env bash
# Score a trained surrogate on a held-out eval set, raw and through the
# EMA weights (the reference notebooks sample through ema_pytorch.EMA —
# generateapplication.ipynb cell 16). Reference bar: MAE 0.0144
# (reference README.md:10).
#
# Usage: EVAL=runs3/eval_data RES=runs3/results_prod [MILESTONE=best] \
#        [EVAL_PLATES=16] bash examples/eval_surrogate.sh
set -euo pipefail

EVAL=${EVAL:-runs3/eval_data}
RES=${RES:-runs3/results_prod}
MILESTONE=${MILESTONE:-best}
EVAL_PLATES=${EVAL_PLATES:-16}
BS=${BS:-16}

for ema_flag in "" "--use_ema"; do
  python -m fea_tpu sample --milestone "$MILESTONE" \
    --data_dir "$EVAL" --sample_data_dir "$EVAL" \
    --image_size 256 --batch_size "$BS" \
    --num_steps_per_condition 6 --num_sample_conditions_per_plate 4 \
    --results_dir "$RES" $ema_flag

  echo "=== accuracy ${ema_flag:-raw} (milestone $MILESTONE) ==="
  python -m fea_tpu accuracy \
    --data_dir "$EVAL" --results_dir "$RES" --milestone "$MILESTONE" \
    --image_size 256 --num_plates "$EVAL_PLATES" --conditions_per_plate 4 \
    --steps_per_condition 6
done

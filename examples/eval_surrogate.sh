#!/usr/bin/env bash
# Score a trained surrogate on a held-out eval set, raw and through the
# EMA weights (the reference notebooks sample through ema_pytorch.EMA —
# generateapplication.ipynb cell 16). Reference bar: MAE 0.0144
# (reference README.md:10).
#
# Usage: EVAL=runs3/eval_data RES=runs3/results_prod [MILESTONE=best] \
#        [EVAL_PLATES=<auto>] bash examples/eval_surrogate.sh
set -euo pipefail

EVAL=${EVAL:-runs3/eval_data}
RES=${RES:-runs3/results_prod}
MILESTONE=${MILESTONE:-best}
BS=${BS:-16}

# Derive the plate count from the dataset unless overridden: sampling
# auto-detects every plate dir, so a stale hardcoded count would make
# accuracy silently score a subset (or crash on a missing plate).
if [ -z "${EVAL_PLATES:-}" ]; then
  EVAL_PLATES=$(ls "$EVAL" | grep -c '^[0-9][0-9]*$' || true)
fi

for ema_flag in "" "--use_ema"; do
  python -m fea_tpu sample --milestone "$MILESTONE" \
    --data_dir "$EVAL" --sample_data_dir "$EVAL" \
    --image_size 256 --batch_size "$BS" \
    --num_steps_per_condition 6 --num_sample_conditions_per_plate 4 \
    --results_dir "$RES" $ema_flag

  echo "=== accuracy ${ema_flag:-raw} (milestone $MILESTONE, $EVAL_PLATES plates) ==="
  python -m fea_tpu accuracy \
    --data_dir "$EVAL" --results_dir "$RES" --milestone "$MILESTONE" \
    --image_size 256 --num_plates "$EVAL_PLATES" --conditions_per_plate 4 \
    --steps_per_condition 6

  # keep both passes auditable on disk: the EMA pass would otherwise
  # overwrite the raw samples in $RES/$MILESTONE with nothing marking
  # which weights produced them
  if [ -z "$ema_flag" ]; then
    rm -rf "$RES/$MILESTONE-raw-samples"
    cp -r "$RES/$MILESTONE" "$RES/$MILESTONE-raw-samples"
  fi
done

#!/usr/bin/env bash
# Crash-resilient training driver. On this container the tunneled device
# plugin leaks host staging memory per step, so 10k-step runs are
# OOM-killed every ~2000 steps; milestones save every 500 steps and
# `--checkpoint auto` resumes from the newest readable checkpoint, so
# looping the CLI until it exits 0 completes the run losing at most one
# milestone per crash. Harmless on healthy runtimes (single iteration).
#
# Usage: DATA=runs/train_data EVAL=runs/eval_data RES=runs/results \
#        STEPS=10000 bash examples/train_loop_resume.sh
set -u

DATA=${DATA:-runs/train_data}
EVAL=${EVAL:-runs/eval_data}
RES=${RES:-runs/results}
STEPS=${STEPS:-10000}
BS=${BS:-16}

resume=()
if [ -d "$RES/model-latest" ] || [ -d "$RES/model-best" ]; then
  resume=(--checkpoint auto)
fi

for attempt in $(seq 1 10); do
  python -m fea_tpu train \
    --data_dir "$DATA" --sample_data_dir "$EVAL" \
    --image_size 256 --batch_size "$BS" --num_steps "$STEPS" \
    --learning_rate 3e-4 --num_steps_per_milestone 500 \
    --conditions_per_plate 4 --num_steps_per_condition 6 \
    --num_steps_per_sample_condition 6 --num_sample_conditions_per_plate 1 \
    --skip_dataset_size_check \
    --results_dir "$RES" "${resume[@]}"
  rc=$?
  echo "ATTEMPT $attempt EXIT $rc"
  [ $rc -eq 0 ] && exit 0
  resume=(--checkpoint auto)
  sleep 20
done
exit 1

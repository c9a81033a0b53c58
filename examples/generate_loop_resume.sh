#!/usr/bin/env bash
# Crash-resilient datagen driver. The tunneled device plugin leaks
# transferred HBM buffers (per-solver tables, per-chunk condition
# arrays), so multi-thousand-plate runs exhaust the 16 GB chip after
# ~2000+ plates (~700 before the device-side band plan moved in-kernel).
# Plates already written are never redone: each attempt resumes at
# --start_plate = (#written + 1) with a fresh seed (the geometry stream
# is seed-sequential, so reusing the seed would regenerate duplicates).
# The persistent compile cache makes restarts cost ~2-3 min.
#
# Usage: DATA=runs3/train_data PLATES=4000 SEED=300 \
#        bash examples/generate_loop_resume.sh
set -u

DATA=${DATA:-runs3/train_data}
PLATES=${PLATES:-4000}
SEED=${SEED:-300}
BS=${BS:-8}
# Where the production run's bucket growth settled (docs/PERFORMANCE.md):
# starting there skips the early recompile ladder (~10 min of stalls).
export FEA_TPU_BUCKET_FLOOR=${FEA_TPU_BUCKET_FLOOR:-12288,24576,24,384}

for attempt in $(seq 0 40); do
  # bench.py owns the chip while this flag exists (it stops the active
  # datagen and expects exclusive device time); resume when it clears.
  # A flag older than 2 h is stale (SIGKILLed bench) — ignore it.
  while [ -n "$(find /tmp/fea_tpu_bench_pause -mmin -120 2>/dev/null)" ]; do
    echo "bench in progress, datagen paused..."
    sleep 30
  done
  # count COMPLETE plates only: input.png is written last (atomically)
  # by write_job, so a killed run's partial plate dir lacks it; delete
  # partials so the resumed run regenerates them instead of shipping a
  # truncated plate that poisons `fea_tpu store` later
  done_now=0
  while [ -f "$DATA/$((done_now + 1))/input.png" ]; do
    done_now=$((done_now + 1))
  done
  for d in "$DATA"/[0-9]*/; do
    [ -d "$d" ] || continue
    b=$(basename "$d")
    if [ "$b" -gt "$done_now" ] 2>/dev/null; then
      echo "dropping partial plate dir $d"
      rm -rf "$d"
    fi
  done
  remaining=$((PLATES - done_now))
  [ "$remaining" -le 0 ] && exit 0
  echo "ATTEMPT $attempt: $done_now written, $remaining to go"
  python -m fea_tpu generate --batched --batch_size "$BS" \
    --num_plates "$remaining" --start_plate $((done_now + 1)) \
    --conditions_per_plate 4 --steps_per_condition 6 \
    --mesh_size 1e-2 --image_size 512 --save_displacement \
    --data_dir "$DATA" --seed $((SEED + attempt))
  rc=$?
  echo "ATTEMPT $attempt EXIT $rc"
  [ $rc -eq 0 ] && exit 0
  sleep 15
done
exit 1

#!/usr/bin/env bash
# Crash-resilient training driver. On this container the tunneled device
# plugin leaks host staging memory per step, so 10k-step runs are
# OOM-killed every ~2000 steps; milestones save every 500 steps and
# `--checkpoint auto` resumes from the newest readable checkpoint, so
# looping the CLI until it exits 0 completes the run losing at most one
# milestone per crash. Harmless on healthy runtimes (single iteration).
#
# Usage: DATA=runs/train_data EVAL=runs/eval_data RES=runs/results \
#        STEPS=10000 [STORE=runs/store256] [DTYPE=bfloat16] [EMA=1] \
#        bash examples/train_loop_resume.sh
set -u

DATA=${DATA:-runs/train_data}
EVAL=${EVAL:-runs/eval_data}
RES=${RES:-runs/results}
STEPS=${STEPS:-10000}
BS=${BS:-16}

extra=()
# decoded-on-disk condition store (build with `fea_tpu store`): feeds
# production-scale datasets at device speed
if [ -n "${STORE:-}" ]; then
  extra+=(--dataset_store "$STORE")
  # pre-warm the page cache: random-access memmap reads are ~25x slower
  # cold (37 ms vs 1.4 ms/sample measured); one sequential read fixes it
  cat "$STORE"/*.npy "$STORE"/*.npz > /dev/null 2>&1 || true
fi
# bf16 MXU compute with f32 master weights
[ -n "${DTYPE:-}" ] && extra+=(--compute_dtype "$DTYPE")
# track EMA weights (the reference notebooks sample through EMA)
[ -n "${EMA:-}" ] && extra+=(--use_ema_model)

if [ -d "$RES/model-latest" ] || [ -d "$RES/model-best" ]; then
  extra+=(--checkpoint auto)
  resumed=1
else
  resumed=0
fi

# HBM-resident condition tables: batches assembled on device from index
# vectors (~100 bytes/step of host traffic; also sidesteps the tunnel
# plugin's per-upload staging-buffer leak). Staged fallback: two
# consecutive fast failures (< FAST_FAIL_S, e.g. an HBM OOM at init)
# first add --remat (near-zero stored activations), then drop the
# resident tables entirely — the host feed is the known-good path.
# Default ON whenever a store is in play (bit-exact vs the host feed,
# ~100 bytes/step host traffic, sidesteps the per-upload staging leak);
# DEVRES=0 opts out. The fallback ladder below self-heals an HBM OOM.
case "${DEVRES-auto}" in
  auto)
    devres_mode=""
    if [ -n "${STORE:-}" ]; then
      devres_mode=tables
      # Measured 2026-08-18: at the full 4,000-plate store (6.53 GB
      # bitpacked tables) the single-pass 256px/b16 step's HLO temps
      # no longer fit v5e HBM (15.93 G needed of 15.75 G) and the run
      # burns two fast-fail attempts walking to tables+accum. Start
      # there directly when the store is production-sized.
      store_kb=$(du -sk "$STORE" 2>/dev/null | cut -f1 || echo 0)
      if [ "${store_kb:-0}" -gt $((5 * 1024 * 1024)) ]; then
        devres_mode="tables+accum"
        echo "store is $((store_kb / 1024 / 1024)) GB: starting at feed mode tables+accum"
      fi
    fi
    ;;
  0 | "") devres_mode="" ;;
  tables+accum) devres_mode="tables+accum" ;;
  *) devres_mode=tables ;;
esac
# devres_mode: tables -> tables+accum -> off.
# tables+accum halves the train step's HLO temps (micro-batch BS/2 x 2
# accumulation steps, same effective batch — measured ~6.7 GB -> ~3.4 GB
# at 256px/b16), which is the guaranteed-fit rung when the resident
# tables leave too little HBM for the single-pass step. A whole-loss
# --remat rung was measured useless on 2026-08-18 (50 MB: arguments
# dominate and checkpointing the full loss doesn't shrink backward peak)
# and only cost ~10 min of fast-fails per fresh start, so it was dropped.
FAST_FAIL_S=${FAST_FAIL_S:-900}
fast_fails=0

# Stall-watchdog sidecar: the tunnel can wedge any rpc for an hour+
# (measured 2026-08-19: trainer frozen 57 min mid-checkpoint-save at
# step 6500); a hung attempt never exits, so this loop never retries it.
# The watchdog kills the trainer by exact PID when its log stops moving.
if [ "${WATCHDOG:-1}" = 1 ]; then
  RES="$RES" bash "$(dirname "$0")/train_watchdog.sh" &
  watchdog_pid=$!
  trap '[ -n "${watchdog_pid:-}" ] && kill "$watchdog_pid" 2>/dev/null' EXIT
fi

for attempt in $(seq 1 40); do
  # bench.py owns the chip while this flag exists (it stops the active
  # trainer and expects exclusive device time); resume when it clears.
  # A flag older than 2 h is stale (SIGKILLed bench) — ignore it.
  while [ -n "$(find /tmp/fea_tpu_bench_pause -mmin -120 2>/dev/null)" ]; do
    echo "bench in progress, training paused..."
    sleep 30
  done
  run_extra=()
  case "${devres_mode:-off}" in
    tables) run_extra=(--device_resident_store) ;;
    tables+accum) run_extra=(--device_resident_store \
      --batch_size $((BS / 2)) --num_gradient_accumulation_steps 2) ;;
  esac
  t_start=$(date +%s)
  python -m fea_tpu train \
    --data_dir "$DATA" --sample_data_dir "$EVAL" \
    --image_size 256 --batch_size "$BS" --num_steps "$STEPS" \
    --learning_rate 3e-4 --num_steps_per_milestone 500 \
    --conditions_per_plate 4 --num_steps_per_condition 6 \
    --num_steps_per_sample_condition 6 --num_sample_conditions_per_plate 1 \
    --skip_dataset_size_check \
    --results_dir "$RES" "${extra[@]}" ${run_extra[@]+"${run_extra[@]}"}
  rc=$?
  echo "ATTEMPT $attempt EXIT $rc (mode ${devres_mode:-off})"
  [ $rc -eq 0 ] && exit 0
  if [ "$resumed" = 0 ]; then extra+=(--checkpoint auto); resumed=1; fi
  # A watchdog STALE kill (tunnel wedge) can exit in under FAST_FAIL_S;
  # it must not count as an OOM-style fast fail or two tunnel wedges
  # would needlessly downgrade the feed mode. The watchdog leaves a
  # marker file; only count it if the marker predates this attempt.
  wd_killed=0
  if [ -f "$RES/.watchdog_killed" ] \
      && [ "$(stat -c %Y "$RES/.watchdog_killed")" -ge "$t_start" ]; then
    wd_killed=1
    rm -f "$RES/.watchdog_killed"
  fi
  if [ "$wd_killed" = 1 ]; then
    echo "attempt killed by watchdog (tunnel stall) — not a fast fail"
  elif [ $(($(date +%s) - t_start)) -lt "$FAST_FAIL_S" ]; then
    fast_fails=$((fast_fails + 1))
  else
    fast_fails=0
  fi
  if [ "$fast_fails" -ge 2 ] && [ -n "${devres_mode:-}" ]; then
    case "$devres_mode" in
      tables) devres_mode="tables+accum" ;;
      *) devres_mode="" ;;
    esac
    fast_fails=0
    echo "fallback: feed mode now '${devres_mode:-off}'"
  fi
  sleep 20
done
exit 1

#!/usr/bin/env bash
# Unattended post-training eval sidecar. Waits for the resilient
# training loop to finish (the trainer writes `model-final` only after
# the last step — trainer.py save_checkpoint("final")), then scores the
# surrogate raw and through EMA with examples/eval_surrogate.sh for both
# the `final` and `best` milestones, logging to $RES/eval_final.log.
# Idempotent: exits immediately if the log already records a result.
#
# Usage: EVAL=runs3/eval_data RES=runs3/results_prod \
#        bash examples/eval_when_done.sh
set -u

EVAL=${EVAL:-runs3/eval_data}
RES=${RES:-runs3/results_prod}
LOG="$RES/eval_final.log"

# EVAL_COMPLETE is appended only after every milestone scored OK — a
# failed/partial eval must not mark the sidecar done
[ -f "$LOG" ] && grep -q "EVAL_COMPLETE" "$LOG" && exit 0

while true; do
  if [ -d "$RES/model-final" ]; then
    # make sure the trainer process itself has exited (checkpoint write
    # finishes before process exit, but be conservative about the chip)
    busy=0
    for p in /proc/[0-9]*; do
      # subshell: silence the shell's own redirect error on a proc race
      if (tr '\0' ' ' < "$p/cmdline") 2>/dev/null \
          | grep -q "fea_tpu train .*--results_dir $RES"; then
        busy=1
        break
      fi
    done
    [ "$busy" = 0 ] && break
  fi
  sleep 120
done

echo "training complete, scoring (raw+EMA, final+best)" | tee -a "$LOG"
all_ok=1
for ms in final best; do
  ok=0
  for attempt in 1 2; do
    if EVAL="$EVAL" RES="$RES" MILESTONE="$ms" timeout 3600 \
        bash "$(dirname "$0")/eval_surrogate.sh" >> "$LOG" 2>&1; then
      ok=1
      break
    else
      rc=$?
      echo "eval milestone=$ms attempt $attempt failed (rc $rc)" \
        | tee -a "$LOG"
      sleep 60
    fi
  done
  [ "$ok" = 1 ] || all_ok=0
done
if [ "$all_ok" = 1 ]; then
  echo "EVAL_COMPLETE" >> "$LOG"
fi
echo "eval done: $LOG"

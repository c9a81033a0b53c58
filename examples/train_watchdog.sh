#!/usr/bin/env bash
# Stall watchdog for train_loop_resume.sh on the tunneled TPU runtime.
#
# The axon tunnel can hang any rpc for tens of minutes (CLAUDE.md); a hung
# trainer never exits, so the resilient loop never gets to restart it.
# This sidecar kills the trainer python (by exact PID, read from its
# command line match on the results dir) when the run log stops moving:
#   - no train-*.log younger than $INIT_GRACE after the process started
#     (hung device init / remote compile), or
#   - newest train-*.log older than $STALE (hung step rpc; milestones
#     with sampling + orbax save stay well under this).
#
# Usage: RES=runs/results [STALE=600] [INIT_GRACE=1500] \
#        bash examples/train_watchdog.sh
set -u
RES=${RES:?results dir}
STALE=${STALE:-600}
INIT_GRACE=${INIT_GRACE:-1500}

while true; do
  sleep 60
  # exact-match the trainer python for this results dir; never pattern-kill
  pid=""
  for p in /proc/[0-9]*; do
    # subshell so the shell's own redirect error (proc exited between the
    # glob and the open) is silenced too, not just tr's stderr
    # fixed-string match with a trailing space so RES=runs/results does
    # NOT match --results_dir runs/results_v2, and '.' in the path is
    # not a regex wildcard (tr leaves a trailing space after the last arg)
    cmd=$( (tr '\0' ' ' < "$p/cmdline") 2>/dev/null ) || continue
    if printf '%s' "$cmd" | grep -qF "fea_tpu" \
        && printf '%s' "$cmd" | grep -qF " train " \
        && printf '%s' "$cmd" | grep -qF -- "--results_dir $RES "; then
      pid=${p#/proc/}
      break
    fi
  done
  [ -z "$pid" ] && continue
  start=$(stat -c %Y "/proc/$pid" 2>/dev/null) || continue
  now=$(date +%s)
  newest=$(ls -t "$RES"/train-*.log 2>/dev/null | head -1)
  if [ -z "$newest" ] || [ "$(stat -c %Y "$newest")" -lt "$start" ]; then
    # no log from THIS attempt yet: allow compile/init grace
    if [ $((now - start)) -gt "$INIT_GRACE" ]; then
      echo "watchdog: pid $pid no log after $((now - start))s, killing"
      touch "$RES/.watchdog_killed"
      kill "$pid"
    fi
    continue
  fi
  age=$((now - $(stat -c %Y "$newest")))
  if [ "$age" -gt "$STALE" ] && [ $((now - start)) -gt "$STALE" ]; then
    echo "watchdog: pid $pid log stale ${age}s, killing"
    # marker so the resume loop knows this was a stall kill, not an
    # OOM/init failure — it must NOT count toward the feed-mode fallback
    touch "$RES/.watchdog_killed"
    kill "$pid"
  fi
done

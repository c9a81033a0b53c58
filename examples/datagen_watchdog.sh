#!/usr/bin/env bash
# Stall watchdog for generate_loop_resume.sh on the tunneled TPU runtime.
#
# The axon tunnel can hang any rpc for tens of minutes (CLAUDE.md); a
# hung datagen process never exits, so the resilient loop never gets to
# restart it. This sidecar kills the datagen python (by exact PID, read
# from its command line match on the data dir) when the dataset stops
# growing:
#   - nothing written under $DATA for $INIT_GRACE after the process
#     started (hung device init / cold remote compile), or
#   - newest write under $DATA older than $STALE (hung step rpc; bucket
#     recompiles on a warm cache stay well under this).
#
# Usage: DATA=runs3/train_data [STALE=1200] [INIT_GRACE=3600] \
#        bash examples/datagen_watchdog.sh
set -u
DATA=${DATA:?data dir}
STALE=${STALE:-1200}
INIT_GRACE=${INIT_GRACE:-3600}

newest_mtime() {
  # newest mtime of any file directly inside plate dirs (cheap: the
  # per-plate dirs are flat; avoid a full find over 100k files by
  # checking only the 3 highest-numbered plate dirs)
  local latest=0 d m
  for d in $(ls -1 "$DATA" 2>/dev/null | grep -E '^[0-9]+$' \
             | sort -n | tail -3); do
    m=$(find "$DATA/$d" -newer /proc/1 -printf '%T@\n' 2>/dev/null \
        | sort -n | tail -1)
    m=${m%%.*}
    [ -n "$m" ] && [ "$m" -gt "$latest" ] && latest=$m
  done
  echo "$latest"
}

while true; do
  sleep 60
  pid=""
  for p in /proc/[0-9]*; do
    # subshell: silence the shell's own redirect error on a proc race
    # fixed-string match with a trailing space: no prefix-path collisions,
    # no regex wildcards from '.' in the path
    cmd=$( (tr '\0' ' ' < "$p/cmdline") 2>/dev/null ) || continue
    if printf '%s' "$cmd" | grep -qF "fea_tpu" \
        && printf '%s' "$cmd" | grep -qF " generate " \
        && printf '%s' "$cmd" | grep -qF -- "--data_dir $DATA "; then
      pid=${p#/proc/}
      break
    fi
  done
  [ -z "$pid" ] && continue
  start=$(stat -c %Y "/proc/$pid" 2>/dev/null) || continue
  now=$(date +%s)
  latest=$(newest_mtime)
  if [ "$latest" -lt "$start" ]; then
    # nothing written by THIS attempt yet: allow compile/init grace
    if [ $((now - start)) -gt "$INIT_GRACE" ]; then
      echo "watchdog: datagen pid $pid no output after $((now - start))s, killing"
      kill "$pid"
    fi
    continue
  fi
  age=$((now - latest))
  if [ "$age" -gt "$STALE" ] && [ $((now - start)) -gt "$STALE" ]; then
    echo "watchdog: datagen pid $pid output stale ${age}s, killing"
    kill "$pid"
  fi
done

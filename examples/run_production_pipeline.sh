#!/usr/bin/env bash
# Top-level unattended supervisor for the round-3 production pipeline
# (examples/train_real.sh: datagen -> store -> train -> eval). Rides
# through axon-relay deaths (the relay can die host-side for hours,
# CLAUDE.md): waits for the relay port before each attempt, and retries
# train_real.sh until it completes — every stage inside is idempotent
# (datagen/eval .done markers, resumable store build, --checkpoint auto
# training resume).
#
# Usage: nohup bash examples/run_production_pipeline.sh \
#          > runs3/pipeline.log 2>&1 &
set -u
PORT=${PORT:-8082}
cd "$(dirname "$0")/.."

wait_relay() {
  until python3 - <<EOF
import socket, sys
s = socket.socket(); s.settimeout(3)
try:
    s.connect(("127.0.0.1", $PORT)); sys.exit(0)
except Exception:
    sys.exit(1)
EOF
  do
    echo "$(date -u +%FT%TZ) tpu relay :$PORT down, waiting..."
    sleep 60
  done
}

for attempt in $(seq 1 60); do
  wait_relay
  echo "$(date -u +%FT%TZ) PIPELINE ATTEMPT $attempt"
  bash examples/train_real.sh && { echo "PIPELINE_COMPLETE"; exit 0; }
  echo "$(date -u +%FT%TZ) pipeline attempt $attempt failed (rc $?)"
  sleep 60
done
exit 1

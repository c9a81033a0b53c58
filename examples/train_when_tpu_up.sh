#!/usr/bin/env bash
# Tunnel-aware supervisor: wait until the axon relay port accepts
# connections (the tunnel helper can die host-side and come back),
# then hand off to the crash-resilient training loop. Re-enters the
# wait whenever the loop exhausts its attempts while the tunnel is
# down. All train_loop_resume.sh env vars pass through.
set -u
PORT=${PORT:-8082}

while true; do
  until python3 - <<EOF
import socket, sys
s = socket.socket(); s.settimeout(3)
try:
    s.connect(("127.0.0.1", $PORT)); sys.exit(0)
except Exception:
    sys.exit(1)
EOF
  do
    echo "tpu relay :$PORT down, waiting..."
    sleep 60
  done
  echo "tpu relay :$PORT up, starting training loop"
  bash "$(dirname "$0")/train_loop_resume.sh" && exit 0
  echo "training loop gave up (rc $?), re-checking tunnel"
  sleep 30
done

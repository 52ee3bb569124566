#!/usr/bin/env bash
# Start the tpuvdb server in the background with a pidfile + liveness check.
# Ops parity: Scripts/start_coordinator.sh + start_datanode.sh in the
# reference (bg launch, pidfile, port check) — but one process serves both
# roles here: the coordinator surface and every shard (the mesh is the
# cluster).
set -euo pipefail

HOST="${TPUVDB_HOST:-127.0.0.1}"
PORT="${TPUVDB_PORT:-8081}"
DATA_DIR="${TPUVDB_DATA_DIR:-./data}"
RUN_DIR="${TPUVDB_RUN_DIR:-./run}"
LOG_FILE="$RUN_DIR/server.log"
PID_FILE="$RUN_DIR/server.pid"

mkdir -p "$RUN_DIR" "$DATA_DIR"

if [[ -f "$PID_FILE" ]] && kill -0 "$(cat "$PID_FILE")" 2>/dev/null; then
  echo "tpuvdb already running (pid $(cat "$PID_FILE"))"
  exit 0
fi

nohup python -m tpuvdb.api.cli serve \
  --host "$HOST" --port "$PORT" --data-dir "$DATA_DIR" \
  >>"$LOG_FILE" 2>&1 &
echo $! > "$PID_FILE"

# liveness: poll the health endpoint (ref used netstat port checks)
for _ in $(seq 1 30); do
  if curl -sf "http://$HOST:$PORT/healthz" >/dev/null 2>&1; then
    echo "tpuvdb serving on http://$HOST:$PORT (pid $(cat "$PID_FILE"))"
    exit 0
  fi
  sleep 1
done
echo "server failed to come up; see $LOG_FILE" >&2
exit 1

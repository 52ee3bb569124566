#!/usr/bin/env bash
# Register an external serving node with the coordinator
# (ops parity: Scripts/register_datanode.sh).
set -euo pipefail

COORD="${TPUVDB_COORD:-127.0.0.1:8081}"
NODE_ID="${1:?usage: register_node.sh NODE_ID ADDRESS}"
ADDRESS="${2:?usage: register_node.sh NODE_ID ADDRESS}"

python -m tpuvdb.api.cli --coord-addr "$COORD" register-node "$NODE_ID" "$ADDRESS"

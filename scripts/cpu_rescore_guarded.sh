#!/bin/bash
# CPU multi-view rescore of saved parity checkpoints, guarded by the
# tunnel-liveness rule: a live axon tunnel means the watchdog is resuming
# the TPU parity run, and heavy host CPU work alongside a live TPU run has
# wedged the RPC stream before (PERF.md incident log). So this wrapper
# kills the rescore the moment the tunnel comes back; eval_parity.py writes
# PARITY_MULTIVIEW.json incrementally per stage, so completed stages keep.
set -u
cd "$(dirname "$0")/.."

OUT_DIR="${1:-out/parity_r03d}"
STAGES="${2:-split_smpl,init}"

D3H_PLATFORM=cpu python scripts/eval_parity.py \
    --out-dir "$OUT_DIR" --stages "$STAGES" \
    > /tmp/rescore.log 2>&1 &
EV=$!
echo "$EV" > /tmp/rescore.pid
echo "[rescore-guard] eval pid=$EV"

while kill -0 "$EV" 2>/dev/null; do
    if python - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8082), 3).close()
    sys.exit(0)   # tunnel ALIVE
except OSError:
    sys.exit(1)
EOF
    then
        echo "[rescore-guard] tunnel is back; yielding host CPU to training"
        kill "$EV" 2>/dev/null
        wait "$EV" 2>/dev/null
        exit 0
    fi
    sleep 30
done
echo "[rescore-guard] rescore finished"

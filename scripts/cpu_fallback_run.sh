#!/bin/bash
# Medium-scale CPU convergence run (insurance while the TPU tunnel is dead).
# Kills itself the moment the tunnel returns so the watchdog-resumed TPU
# parity run gets a quiet host (heavy host CPU has wedged the axon RPC
# stream before — see memory/STABILITY notes).
set -u
cd "$(dirname "$0")/.."
D3H_PLATFORM=cpu nice -n 15 python train_d3h.py \
    --config configs/m512_synth.json --synthetic \
    --out-dir out/parity_m512 --resume \
    > /tmp/cpu_m512.log 2>&1 &
RUN=$!
echo $RUN > /tmp/cpu_m512.pid
while kill -0 $RUN 2>/dev/null; do
    if python - <<'PYEOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8082), 3).close(); sys.exit(0)
except OSError:
    sys.exit(1)
PYEOF
    then
        echo "[cpu-fallback] tunnel returned; stopping CPU run (TPU takes priority)"
        kill $RUN; break
    fi
    sleep 60
done
wait $RUN 2>/dev/null
echo "[cpu-fallback] exit"

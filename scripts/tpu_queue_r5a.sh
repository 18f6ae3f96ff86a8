#!/bin/bash
# Round-5 queue, wave 1 — gated on the AB_DENSEAA03 run (pid file /tmp/ab03.pid).
# 1. reference-layout export at full res (needs the chip: oracle GT renders)
# 2. op-level device trace of the init bench step (TRACE_r05_init.txt)
# 3. headline bench probe with the r5 structural changes
set -u
cd "$(dirname "$0")/.."

while kill -0 "$(cat /tmp/ab03.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "[queue-r5a] A/B done; starting wave 1" 

python scripts/export_reference_layout.py --out out/ref_layout \
    --folder neutral-synth --res 1080 --frames 64 \
    > /tmp/export_layout.log 2>&1 \
    && echo "[queue-r5a] layout export ok" || echo "[queue-r5a] export FAILED"

python scripts/profile_trace.py 6 > TRACE_r05_init.txt 2>/tmp/trace.err \
    && echo "[queue-r5a] trace ok" || { echo "[queue-r5a] trace FAILED"; tail -5 /tmp/trace.err; }

python bench.py > /tmp/bench_r05_probe.json 2>/tmp/bench_r05_probe.log \
    && echo "[queue-r5a] bench ok: $(tail -1 /tmp/bench_r05_probe.json)" \
    || echo "[queue-r5a] bench FAILED"
echo "[queue-r5a] done"
